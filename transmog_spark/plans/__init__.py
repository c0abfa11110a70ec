"""Plan construction: schema-driven analogs of the reference's per-record recursion."""
