"""Corpus-curation pipeline: composition equivalence, resume, chain safety.

The pipeline is pure plumbing of independently-oracled operators (q37-q41,
q48-q49 cover exact dedup, LSH pairs, CC survivors; q38-q40 pin the text
builders), so the gates here are about the PIPELINE properties: the staged,
materialized run must equal composing the operators directly in memory;
a killed run must resume to the identical corpus; a changed config or
input must invalidate downstream stages rather than mix versions.
"""

from __future__ import annotations

import os

import pytest

from jobs.curate_corpus import (
    STAGES,
    CurateConfig,
    SimulatedCrash,
    curate_corpus,
    read_curated,
)
from featureextraction_jl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    near_dedup_survivors,
)
from featureextraction_jl_spark.functions.text import (
    langid_cols,
    quality_cols,
    token_count_cols,
)

CFG = CurateConfig(min_word_tokens=3, max_digit_frac=0.5, keep_langs=())


def _docs_path(sf_dir):
    return os.path.join(sf_dir, "documents.parquet")


def _direct(spark, sf_dir, cfg: CurateConfig):
    """The pipeline composed in memory — no staging, same operators."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(_docs_path(sf_dir))
    stats = docs.select(cfg.id_col, cfg.text_col,
                        *token_count_cols(cfg.text_col),
                        *quality_cols(cfg.text_col),
                        *langid_cols(cfg.text_col))
    exact = exact_dedup(stats, cfg.text_col, cfg.id_col)
    pairs = minhash_lsh_pairs(exact, cfg.text_col, cfg.id_col,
                              num_hashes=cfg.num_hashes, bands=cfg.bands,
                              k=cfg.shingle_k, max_bucket=cfg.max_bucket)
    nd = near_dedup_survivors(exact, pairs, cfg.id_col)
    out = nd.filter(F.col("n_word_tokens") >= cfg.min_word_tokens)
    out = out.filter((F.col("n_digits") / F.greatest(F.col("len"), F.lit(1)))
                     <= cfg.max_digit_frac)
    if cfg.keep_langs:
        out = out.filter(F.col("lang_pred").isin(*cfg.keep_langs))
    return out


def _snapshot(df):
    rows = df.collect()
    return {r.doc_id: tuple(r) for r in rows}, len(rows)


def test_pipeline_equals_direct_composition(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    job = curate_corpus(spark, _docs_path(sf_dir), out, CFG)
    staged, n = _snapshot(read_curated(spark, out))
    direct, n2 = _snapshot(_direct(spark, sf_dir, CFG))
    assert staged == direct and n == n2 == job["rows_final"]
    # monotone corpus shrinkage across stages, nothing degenerate
    r = job["rows_out_per_stage"]
    assert r["stats"] >= r["exact"] >= r["neardup"] >= r["final"] > 0
    assert job["stages_computed_this_run"] == list(STAGES)


def test_resume_after_crash_equals_direct(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    with pytest.raises(SimulatedCrash):
        curate_corpus(spark, _docs_path(sf_dir), out, CFG, fail_after_stages=2)
    # the final stage must not be readable from a half-finished run
    with pytest.raises((FileNotFoundError, ValueError)):
        read_curated(spark, out)
    job = curate_corpus(spark, _docs_path(sf_dir), out, CFG)
    assert job["stages_resumed"] == ["stats", "exact"]
    assert job["stages_computed_this_run"] == ["neardup", "final"]
    staged, _ = _snapshot(read_curated(spark, out))
    direct, _ = _snapshot(_direct(spark, sf_dir, CFG))
    assert staged == direct


def test_noop_rerun_skips_everything(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    first = curate_corpus(spark, _docs_path(sf_dir), out, CFG)
    second = curate_corpus(spark, _docs_path(sf_dir), out, CFG)
    assert second["stages_computed_this_run"] == []
    assert second["stages_resumed"] == list(STAGES)
    assert second["rows_out_per_stage"] == first["rows_out_per_stage"]


def test_config_change_invalidates_all_stages(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    curate_corpus(spark, _docs_path(sf_dir), out, CFG)
    stricter = CurateConfig(min_word_tokens=8, max_digit_frac=0.5,
                            keep_langs=())
    job = curate_corpus(spark, _docs_path(sf_dir), out, stricter)
    assert job["stages_computed_this_run"] == list(STAGES)
    assert job["rows_final"] <= job["rows_out_per_stage"]["neardup"]
    staged, _ = _snapshot(read_curated(spark, out))
    direct, _ = _snapshot(_direct(spark, sf_dir, stricter))
    assert staged == direct


def test_lang_filter_applies(spark, sf_dir, tmp_path):
    out = str(tmp_path / "curated")
    cfg = CurateConfig(min_word_tokens=1, keep_langs=("en",))
    curate_corpus(spark, _docs_path(sf_dir), out, cfg)
    langs = {r.lang_pred for r in
             read_curated(spark, out).select("lang_pred").distinct().collect()}
    assert langs <= {"en"}


def test_missing_required_column_raises(spark, sf_dir, tmp_path):
    bad = str(tmp_path / "bad_docs")
    spark.read.parquet(_docs_path(sf_dir)).select("doc_id") \
        .write.parquet(bad)
    with pytest.raises(ValueError, match="required column"):
        curate_corpus(spark, bad, str(tmp_path / "out"), CFG)


def test_read_curated_rejects_unknown_stage(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown stage"):
        read_curated(spark, str(tmp_path), stage="bogus")
