"""Column-level function library (JVM-side expressions first, pandas UDFs second)."""
