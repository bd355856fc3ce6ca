"""Property-based tests (hypothesis) for the pure vectorized kernels.

These run WITHOUT a SparkSession: the pandas-series functions are exactly
what executes inside the Arrow UDFs, so properties proven here hold for the
distributed path (dual-path parity tests tie the two together).
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from abs_log_spark.functions.abstract import (
    _abstract_args_series,
    _abstract_uri_series,
)
from abs_log_spark.functions.parse import _detok_batch

SEGMENT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    min_size=0,
    max_size=12,
)
URI = st.lists(SEGMENT, min_size=1, max_size=6).map(lambda segs: "/" + "/".join(segs))


@settings(max_examples=200, deadline=None)
@given(st.lists(URI, min_size=1, max_size=20))
def test_uri_abstraction_idempotent(uris):
    """abs(abs(x)) == abs(x): '*' is never itself volatile."""
    s = pd.Series(uris)
    once = _abstract_uri_series(s)
    twice = _abstract_uri_series(once)
    assert (once == twice).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(URI, min_size=1, max_size=20))
def test_uri_abstraction_preserves_shape(uris):
    """Segment count and non-volatile segments survive abstraction."""
    s = pd.Series(uris)
    out = _abstract_uri_series(s)
    for orig, abst in zip(s, out):
        o_segs, a_segs = orig.split("/"), abst.split("/")
        assert len(o_segs) == len(a_segs)
        for o, a in zip(o_segs, a_segs):
            assert a == "*" or a == o


ARGKEY = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(ARGKEY, ARGKEY), min_size=1, max_size=5))
def test_args_abstraction_keeps_keys_wildcards_values(kvs):
    args = "&".join(f"{k}={v}" for k, v in kvs)
    out = _abstract_args_series(pd.Series([args])).iloc[0]
    assert out == "&".join(f"{k}=*" for k, _ in kvs)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=200), min_size=1, max_size=10))
def test_detokenize_roundtrips_any_unicode(texts):
    """tokens(text) -> detok == text for arbitrary unicode (the ASCII fast
    path and the chr-join fallback must agree with ord())."""
    toks = pd.Series([[ord(c) for c in t] for t in texts])
    out = _detok_batch(toks)
    assert list(out) == texts
