"""Operator library: flatten family, as-of join, windows, dedup, similarity, text."""
