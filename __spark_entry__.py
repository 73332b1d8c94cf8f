"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` expose the engine's operator catalog
(SURVEY.md §2 coverage + training-data ops) from
``maritime_activity_reports_cdc_spark.queries``; ``entry`` runs the
flagship CDC apply on sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust to being imported from any cwd
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maritime_activity_reports_cdc_spark.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: CDC last-write-wins apply
    over an events-derived change log using the engine's dedup primitive."""
    return QUERIES["cdc_apply_latest"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins — one per queries() entry. Sketch
    queries (minhash/simhash/hyperplane LSH) use the engine's md5_48 hash
    mode so even their signatures reproduce bit-for-bit in DuckDB."""
    return {name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None}
