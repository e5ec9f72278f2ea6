from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("sparc-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        # worker reuse is NOT on by default in this Spark build; the
        # suite launches thousands of small Python-stage jobs
        .config("spark.python.worker.reuse", "true")
        .getOrCreate()
    )
    yield s
    s.stop()
