"""Column-expression function library (text analysis, salting)."""
