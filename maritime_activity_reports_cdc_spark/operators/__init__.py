"""CDC apply, SCD2, dedup, and similarity operators."""
