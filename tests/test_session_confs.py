"""Engine session configuration contract (no Spark start needed)."""

from __future__ import annotations

from featureextraction_jl_spark.session import (
    ENGINE_CONFS,
    WORKER_MALLOC_ENV,
    _dynamic_confs,
)


def test_dynamic_confs_read_env_at_build_time(monkeypatch):
    """SPARK_GRAFT_COALESCE / SPARK_GRAFT_SHUFFLE must take effect when set
    AFTER the module is imported (in-process warm ladder, pytest) — they are
    read per get_spark() call, not frozen into ENGINE_CONFS at import."""
    monkeypatch.setenv("SPARK_GRAFT_COALESCE", "false")
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "17")
    d = _dynamic_confs()
    assert d["spark.sql.adaptive.coalescePartitions.enabled"] == "false"
    assert d["spark.sql.shuffle.partitions"] == "17"
    monkeypatch.delenv("SPARK_GRAFT_COALESCE")
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE")
    d = _dynamic_confs()
    assert d["spark.sql.adaptive.coalescePartitions.enabled"] == "true"
    assert d["spark.sql.shuffle.partitions"] == "32"
    # and neither is frozen into the static conf dict anymore
    assert "spark.sql.adaptive.coalescePartitions.enabled" not in ENGINE_CONFS
    assert "spark.sql.shuffle.partitions" not in ENGINE_CONFS


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
