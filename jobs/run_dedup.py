"""spark-submit entry point for the MinHash-LSH dedup benchmark leg.

Same protocol as jobs/run_pipeline.py --repeat: one JVM, N warm reps of the
full near-dup query (shingle -> minhash signatures -> band buckets ->
capped candidate pairs -> exact-Jaccard verify) over a stored synthetic
corpus, one JSON line per rep. Used by ``bench.py --scaling`` to evidence
the dedup family's N-vs-4N scaling claim alongside the pipeline's
(round-3 verdict ask #7).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="abs-log-spark dedup benchmark")
    p.add_argument("--input", required=True, help="documents parquet dir (doc_id, text)")
    p.add_argument("--run-id", required=True)
    p.add_argument("--master", default=None)
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--min-jaccard", type=float, default=0.5)
    args = p.parse_args(argv)

    from abs_log_spark.operators.dedup import minhash_lsh_pairs
    from abs_log_spark.session import get_spark

    spark = get_spark(app_name=f"abs-log-dedup:{args.run_id}", master=args.master)
    docs = spark.read.parquet(args.input)
    for rep in range(args.repeat):
        handles: list = []
        t0 = time.monotonic()
        pairs = minhash_lsh_pairs(
            docs, min_jaccard=args.min_jaccard, persisted_out=handles
        )
        n_pairs = pairs.count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        for df in handles:  # owned persist lifecycle: release between reps
            df.unpersist()
        print(
            json.dumps({"run_id": args.run_id, "rep": rep, "wall_ms": wall_ms,
                        "n_pairs": n_pairs}),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
