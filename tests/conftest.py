"""Shared fixtures: one session-scoped local SparkSession (the reference's
fixture style, /root/reference/src/maritime_activity_reports/tests/__init__.py:9-43,
minus the Delta/metastore baggage)."""

from __future__ import annotations

import pytest

from maritime_activity_reports_cdc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="cdc-engine-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()
