"""Engine session configuration contract (mostly no Spark start needed;
the get_spark integration check reuses the shared session fixture)."""

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


def test_get_spark_applies_dynamic_confs(spark, monkeypatch):
    """get_spark must actually push _dynamic_confs() into the session —
    pinning the merge in get_spark itself, not just the helper's output
    (builder.config + getOrCreate applies runtime SQL confs to a live
    session, so the env toggle works even mid-process)."""
    from featureextraction_jl_spark.session import get_spark

    before = spark.conf.get("spark.sql.shuffle.partitions")
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", "19")
    try:
        s2 = get_spark("conf-probe")
        assert s2 is spark  # getOrCreate reuses the live session
        assert s2.conf.get("spark.sql.shuffle.partitions") == "19"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_arrow_and_aqe_pinned():
    assert ENGINE_CONFS["spark.sql.execution.arrow.pyspark.enabled"] == "true"
    assert ENGINE_CONFS["spark.sql.adaptive.enabled"] == "true"
    assert ENGINE_CONFS["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert ENGINE_CONFS["spark.sql.session.timeZone"] == "UTC"


def test_heap_pretouch_default(monkeypatch):
    # Concurrent first-touch page faults collapse ~50x on this host class;
    # the pre-touched fixed heap is load-bearing (see BENCH/BASELINE.md).
    # Driver memory + java opts are BUILD-time (dynamic) confs now: a
    # harness that imports this module and only then sets
    # SPARK_DRIVER_MEMORY must see it take effect (round-5 review: the
    # import-time ENGINE_CONFS capture silently ignored it).
    opts = _dynamic_confs()["spark.driver.extraJavaOptions"]
    assert "-XX:+AlwaysPreTouch" in opts
    assert "-Xms" in opts
    assert "spark.driver.memory" not in ENGINE_CONFS
    assert "spark.driver.extraJavaOptions" not in ENGINE_CONFS
    monkeypatch.setenv("SPARK_DRIVER_MEMORY", "7g")
    d = _dynamic_confs()
    assert d["spark.driver.memory"] == "7g"
    assert "-Xms7g" in d["spark.driver.extraJavaOptions"]


def test_worker_malloc_env():
    assert WORKER_MALLOC_ENV["MALLOC_TRIM_THRESHOLD_"] == "-1"
    assert int(WORKER_MALLOC_ENV["MALLOC_MMAP_THRESHOLD_"]) >= 2**28


def test_dynamic_confs_validate_env(monkeypatch):
    """ADVICE r04: bad SPARK_GRAFT_COALESCE values ('0', 'off') previously
    flowed verbatim into a boolean Spark conf and died at session build with
    an opaque IllegalArgumentException — they must raise a descriptive
    ValueError here instead.  Case/whitespace-normalized values pass."""
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_COALESCE", " FALSE ")
    assert _dynamic_confs()[
        "spark.sql.adaptive.coalescePartitions.enabled"] == "false"
    for bad in ("0", "1", "off", "on", "yes", ""):
        monkeypatch.setenv("SPARK_GRAFT_COALESCE", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_COALESCE"):
            _dynamic_confs()
    monkeypatch.delenv("SPARK_GRAFT_COALESCE")
    for bad in ("0", "-4", "abc", ""):
        monkeypatch.setenv("SPARK_GRAFT_SHUFFLE", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_SHUFFLE"):
            _dynamic_confs()
