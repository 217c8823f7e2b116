"""Engine session configuration contract (no Spark start needed)."""

from __future__ import annotations

from featureextraction_jl_spark.session import ENGINE_CONFS, WORKER_MALLOC_ENV


def test_arrow_and_aqe_pinned():
    assert ENGINE_CONFS["spark.sql.execution.arrow.pyspark.enabled"] == "true"
    assert ENGINE_CONFS["spark.sql.adaptive.enabled"] == "true"
    assert ENGINE_CONFS["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert ENGINE_CONFS["spark.sql.session.timeZone"] == "UTC"


def test_heap_pretouch_default():
    # Concurrent first-touch page faults collapse ~50x on this host class;
    # the pre-touched fixed heap is load-bearing (see BENCH/BASELINE.md).
    opts = ENGINE_CONFS["spark.driver.extraJavaOptions"]
    assert "-XX:+AlwaysPreTouch" in opts
    assert "-Xms" in opts


def test_worker_malloc_env():
    assert WORKER_MALLOC_ENV["MALLOC_TRIM_THRESHOLD_"] == "-1"
    assert int(WORKER_MALLOC_ENV["MALLOC_MMAP_THRESHOLD_"]) >= 2**28
