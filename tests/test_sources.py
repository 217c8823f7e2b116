"""B1-B3 gates: schema assertion, pushdown, bucketed layout, and the
Iceberg keep-warm probe (VERDICT r04 next #7 — if the container ever gains
the runtime JAR, the skip flips to a live run automatically)."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from featureextraction_jl_spark.sources import generate_transcripts
from featureextraction_jl_spark.sources.tables import (
    bucket_and_sort,
    read_transcripts,
    write_features,
)


@pytest.fixture(scope="module")
def tdir(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("src") / "transcripts")
    generate_transcripts(spark, 20, seed=3).write.parquet(p)
    return p


def test_schema_assertion_catches_drift(spark, tdir, tmp_path):
    df = read_transcripts(spark, tdir)
    assert df.count() > 0
    # missing column
    bad = str(tmp_path / "missing")
    spark.read.parquet(tdir).drop("role").write.parquet(bad)
    with pytest.raises(ValueError, match="missing column role"):
        read_transcripts(spark, bad)
    # wrong type
    bad2 = str(tmp_path / "wrongtype")
    spark.read.parquet(tdir).withColumn(
        "turn_idx", F.col("turn_idx").cast("long")).write.parquet(bad2)
    with pytest.raises(ValueError, match="column turn_idx"):
        read_transcripts(spark, bad2)


def test_asof_cut_reaches_pushed_filters(spark, tdir):
    cut = datetime.datetime(2024, 6, 1)
    df = read_transcripts(spark, tdir, asof_cut=cut)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ts" in plan, plan[:500]
    assert df.filter(F.col("ts") > F.lit(cut)).count() == 0


def test_bucket_and_sort_single_exchange_reused(spark, tdir):
    """Downstream windows on (conv_id, ts) must reuse the bucket exchange —
    exactly ONE Exchange in the whole plan."""
    from pyspark.sql import Window

    df = bucket_and_sort(read_transcripts(spark, tdir), num_buckets=8)
    w = Window.partitionBy("conv_id").orderBy("ts")
    out = df.withColumn("rn", F.row_number().over(w))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:800]


def test_write_features_roundtrip(spark, tdir, tmp_path):
    out = str(tmp_path / "sink")
    df = read_transcripts(spark, tdir).select("conv_id", "turn_idx")
    write_features(df, out)
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert set(back.columns) == {"conv_id", "turn_idx"}


def test_iceberg_branch_keep_warm(spark, tdir, tmp_path):
    """Runs the REAL Iceberg read/write branches when a runtime JAR is
    present; otherwise skips with the live error so the gate stays
    current (same pattern as the TWS probe in test_streaming.py)."""
    try:
        spark.read.format("iceberg").load(str(tmp_path / "nope")).collect()
    except Exception as e:  # noqa: BLE001 — the class differs by gap
        msg = str(e)
        if "iceberg" in msg.lower() and (
                "DATA_SOURCE_NOT_FOUND" in msg or "Failed to find" in msg
                or "ClassNotFound" in msg):
            pytest.skip(f"no Iceberg runtime JAR in container: {msg[:160]}")
        if "Path does not exist" not in msg and "NoSuchTable" not in msg:
            raise
    # JAR present: exercise the format-gated branches end-to-end
    df = read_transcripts(spark, tdir).select("conv_id", "turn_idx")
    write_features(df, "local.db.features_probe", fmt="iceberg",
                   bucket_col="conv_id", num_buckets=4)
    back = spark.read.format("iceberg").load("local.db.features_probe")
    assert back.count() == df.count()


def test_write_features_append_mode(spark, tmp_path):
    """mode='append' must append on the parquet branch (and is honored on
    the Iceberg branch via writer.append() — a silently-replacing append
    is data loss)."""
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    out = str(tmp_path / "feat_append")
    write_features(df, out, mode="append")
    write_features(df, out, mode="append")
    assert spark.read.parquet(out).count() == 20
    import pytest

    with pytest.raises(ValueError, match="overwrite.*append|append.*overwrite"):
        # unknown Iceberg mode fails loudly instead of silently replacing
        write_features(df, "local.db.x", fmt="iceberg", mode="ignore")


def test_write_features_bucket_col_clusters_parquet(spark, tmp_path):
    """bucket_col on the parquet branch clusters rows by hash bucket (one
    file per bucket) instead of being silently ignored; the data round-trips
    exactly."""
    import glob

    df = spark.range(1000).selectExpr("cast(id % 7 as string) conv_id",
                                      "id as v")
    out = str(tmp_path / "feat_bucketed")
    write_features(df, out, bucket_col="conv_id", num_buckets=4)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert sorted(r.v for r in back.collect()) == list(range(1000))
    files = [f for f in glob.glob(out + "/*.parquet")]
    assert 0 < len(files) <= 4  # clustered: at most one file per bucket


def test_read_table_rejects_unknown_fmt(spark):
    """fmt typos used to fall through to the parquet reader (confusing
    far-away failure or silently wrong-format read) — now a plan-time
    ValueError."""
    import pytest

    from featureextraction_jl_spark.sources.tables import read_table

    with pytest.raises(ValueError, match="unknown fmt"):
        read_table(spark, "/tmp/nope", fmt="delta")


def test_write_features_iceberg_append_rejects_bucket_col(spark):
    """DataFrameWriterV2.partitionedBy applies only to create/replace —
    append() ignores it silently, so bucket_col + append must raise
    (appends inherit the existing table's partition spec)."""
    import pytest

    from featureextraction_jl_spark.sources.tables import write_features

    df = spark.createDataFrame([(1,)], "conv_id long")
    with pytest.raises(ValueError, match="append"):
        write_features(df, "cat.db.t", fmt="iceberg", mode="append",
                       bucket_col="conv_id")
