"""Multimodal binary-column plumbing: schema, determinism, stubbed decode."""

from __future__ import annotations

import numpy as np
import pytest

from featureextraction_jl_spark.operators.multimodal import (
    MAGICS,
    attach_media,
    decode_payload,
    extract_media_meta,
    media_feature_vectors,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    import os
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return attach_media(docs, "doc_id", "text")


def test_payload_binary_schema(media):
    types = dict(media.dtypes)
    assert types["payload"] == "binary"
    assert types["media_type"] == "string"
    row = media.select("doc_id", "media_type", "payload").first()
    assert bytes(row.payload[:4]) == MAGICS[row.media_type]


def test_meta_extraction(media):
    meta = extract_media_meta(media)
    assert [f.simpleString() for f in meta.schema.fields] == [
        "doc_id:bigint", "media_type:string", "n_bytes:bigint",
        "magic_hex:string", "content_md5:string"]
    joined = media.select("doc_id", "payload").join(meta, "doc_id")
    for r in joined.limit(20).collect():
        assert r.n_bytes == len(r.payload)
        assert r.magic_hex == bytes(r.payload[:4]).hex()


def test_decode_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNGxxxx", "image", fake=False)
    a = decode_payload(b"\x89PNGxxxx", "image", fake=True)
    b = decode_payload(b"\x89PNGxxxx", "image", fake=True)
    np.testing.assert_array_equal(a, b)          # deterministic in payload
    assert a.shape == (64,)
    c = decode_payload(b"RIFFother", "audio", fake=True)
    assert c.shape == (256,) and not np.array_equal(a[:64], c[:64])


def test_feature_vectors_deterministic(media):
    small = media.limit(30)
    f1 = {r.doc_id: r.feature_vec for r in media_feature_vectors(small).collect()}
    f2 = {r.doc_id: r.feature_vec
          for r in media_feature_vectors(small.repartition(4)).collect()}
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], rtol=0, atol=0)
        assert len(f1[k]) == 8


def test_feature_vectors_exact_numpy_twin(media):
    """VERDICT r04 next #5: a VALUE gate, not just shape/determinism.  The
    fake decoder is seeded by the payload's sha256, so an independent
    NumPy twin (payload bytes -> decode_payload -> the same 8 stats) pins
    the Spark output EXACTLY — the rigor the DuckDB-oracled F-ops get."""
    small = media.limit(40)
    got = {r.doc_id: (r.media_type, r.feature_vec)
           for r in media_feature_vectors(small).collect()}
    src = {r.doc_id: (r.media_type, bytes(r.payload) if r.payload is not None
                      else None)
           for r in small.select("doc_id", "media_type", "payload").collect()}
    assert set(got) == set(src) and len(got) == 40
    for doc_id, (mtype, payload) in src.items():
        if payload is None:
            assert got[doc_id][1] is None
            continue
        x = decode_payload(payload, mtype, fake=True)
        want = [float(x.mean()), float(x.std()), float(x.min()),
                float(x.max()), float(np.median(x)), float(x.sum()),
                float(len(x)), float((x > 0.5).mean())]
        assert got[doc_id][0] == mtype
        np.testing.assert_array_equal(np.asarray(got[doc_id][1]),
                                      np.asarray(want), err_msg=str(doc_id))


def test_feature_vectors_null_payload_propagates(spark):
    """NULL payload -> NULL feature_vec, never a crashed task."""
    df = spark.createDataFrame(
        [(1, "image", None), (2, "audio", b"RIFFdata")],
        "doc_id long, media_type string, payload binary")
    rows = {r.doc_id: r.feature_vec for r in media_feature_vectors(df).collect()}
    assert rows[1] is None and rows[2] is not None and len(rows[2]) == 8
