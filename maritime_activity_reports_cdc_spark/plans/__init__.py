"""Medallion layer plans: bronze (CDC apply), silver (clean/enrich/SCD2),
gold (incremental aggregates)."""
