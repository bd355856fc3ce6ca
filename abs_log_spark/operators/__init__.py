"""Relational operators: enrich/route, aggregate, top-k, dedup, ANN."""
