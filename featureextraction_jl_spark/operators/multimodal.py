"""Multimodal columns: opaque binary payloads + typed metadata (task spec).

Images/audio/video ride Spark as opaque ``binary`` columns with a typed
metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` so each Python batch handles a vector of payloads at once.
The image/audio codec libraries are NOT in this container, so the decode
step is stubbed (NotImplementedError) behind ``fake=True`` — a deterministic
pseudo-decoder seeded by the payload bytes — while everything Spark-side
(schema, partitioning, UDF signature, batch shape) is real and tested.

Scale notes: payloads never pass through a shuffle here — metadata
extraction is a narrow map; keep heavy payload columns out of wide
transforms (project them away before joins, re-attach by key after).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-number registry for the synthetic payloads (real formats' magics)
MAGICS = {
    "image": b"\x89PNG",
    "audio": b"RIFF",
    "video": b"\x00\x00\x00\x18",
}
_TYPES = ["image", "audio", "video"]

META_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
               "magic_hex string, content_md5 string")
FEATURE_SCHEMA = "doc_id long, media_type string, feature_vec array<double>"
RESIZE_SCHEMA = "doc_id long, media_type string, resized array<double>"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_vec array<double>"

#: the fake decoder's native grid: image = IMAGE_SIDE x IMAGE_SIDE pixels,
#: video = VIDEO_FRAMES frames of FRAME_LEN samples (sizes match
#: decode_payload's per-type sample counts: 64 = 8*8, 128 = 16*8)
IMAGE_SIDE = 8
VIDEO_FRAMES = 16
FRAME_LEN = 8

#: fake-decoder sample counts per media type — DERIVED from the grid
#: constants so resize_media's / sample_frames' reshape can never drift
#: from what decode_payload emits
_DECODE_SAMPLES = {
    "image": IMAGE_SIDE * IMAGE_SIDE,
    "audio": 256,
    "video": VIDEO_FRAMES * FRAME_LEN,
}


def attach_media(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Deterministic synthetic payload: 4-byte format magic + UTF-8 content.

    Pure JVM exprs — the payload column is ``binary``, typed like a real
    media blob, cycled image/audio/video by id.  Stands in for a decode-able
    file; the byte layout is reproducible by the SQL oracle
    (magic || encode(text)).
    """
    # pmod, not %: Spark % keeps the dividend's sign, so a negative id
    # (hash-derived ids are plausibly negative) would index element_at with
    # 0 (runtime INVALID_INDEX_OF_ZERO) or -1 (silently the LAST element).
    idx = (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int")
    mtype = F.element_at(F.array(*[F.lit(t) for t in _TYPES]), idx)
    magic = F.element_at(F.array(*[F.lit(MAGICS[t]) for t in _TYPES]), idx)
    payload = F.concat(magic, F.encode(F.col(text_col), "UTF-8"))
    return df.withColumn("media_type", mtype).withColumn("payload", payload)


def extract_media_meta(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads (mapInPandas).

    Output: typed metadata struct columns (bytes, magic, content digest).
    Each batch is processed as a whole — no per-row Python in the plan
    beyond the vectorized loop over the batch's byte strings.
    """
    cols = [id_col, "media_type", payload_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pay = pdf[payload_col]
            # NULL payloads (e.g. a null source text upstream of
            # attach_media) yield NULL metadata fields, matching SQL
            # null-propagation — .astype('int64') / md5(None) would
            # otherwise kill the task on the first null row.
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": pdf["media_type"],
                "n_bytes": pay.str.len().astype("Int64"),
                "magic_hex": pay.str[:4].map(bytes.hex, na_action="ignore"),
                "content_md5": pay.str[4:].map(
                    lambda b: hashlib.md5(b).hexdigest(), na_action="ignore"),
            })

    return df.select(*cols).mapInPandas(extract, schema=META_SCHEMA)


def decode_payload(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload to a sample array.

    Real decoding needs PIL/librosa/av which are not in this container —
    ``fake=False`` raises.  ``fake=True`` derives a deterministic pseudo
    sample stream from the payload bytes (seeded by its sha256), preserving
    the downstream contract: a fixed-dtype ndarray whose values depend only
    on the payload.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are not installed in this container; "
            "pass fake=True for the deterministic stub decoder")
    if media_type not in _DECODE_SAMPLES:
        # Loud, not a silent image fallback (round-5 review): decoding a
        # 'pdf' or NULL type as an image grid emits wrong-modality
        # pseudo-features that nothing downstream can detect.  NULL types
        # are handled by the CALLERS' null propagation before decode.
        raise ValueError(
            f"unknown media_type {media_type!r}: expected one of "
            f"{sorted(_DECODE_SAMPLES)}")
    seed = np.frombuffer(hashlib.sha256(payload).digest(), dtype=np.uint64)
    rng = np.random.default_rng(seed)
    return rng.random(_DECODE_SAMPLES[media_type])


def media_feature_vectors(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload",
                          fake: bool = True) -> DataFrame:
    """Decode (stub) + fixed-dim feature extraction per payload (mapInPandas).

    Emits an 8-dim stats vector (moments/extremes of the decoded samples) —
    the shape a real image/audio embedding step would have, ready to feed
    the PCA/whitening kernels like any other ``array<double>`` column.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf[payload_col], pdf["media_type"]):
                if payload is None or mtype is None:
                    # NULL payload OR NULL media_type -> NULL feature
                    # vector (matching extract_media_meta's null
                    # propagation); an unknown NON-null type raises in
                    # decode_payload — never a silent image fallback
                    feats.append(None)
                    continue
                x = decode_payload(payload, mtype, fake=fake)
                feats.append([float(x.mean()), float(x.std()), float(x.min()),
                              float(x.max()), float(np.median(x)),
                              float(x.sum()), float(len(x)),
                              float((x > 0.5).mean())])
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": pdf["media_type"],
                "feature_vec": feats,
            })

    return df.select(id_col, "media_type", payload_col) \
        .mapInPandas(extract, schema=FEATURE_SCHEMA)


def resize_media(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload", out_side: int = 4,
                 fake: bool = True) -> DataFrame:
    """Image resize (area-average downsample) over binary payloads (task spec).

    Decodes each IMAGE payload to its native ``IMAGE_SIDE x IMAGE_SIDE``
    pixel grid and block-averages it down to ``out_side x out_side``
    (emitted flattened, row-major) — the deterministic stand-in for a real
    PIL/OpenCV resize, with the Spark side (Arrow-batched ``mapInPandas``,
    stable schema, null propagation) fully real.  Non-image rows and NULL
    payloads resize to NULL (SQL null propagation; audio/video have no
    pixel grid).  ``out_side`` must divide ``IMAGE_SIDE`` so the block
    average is exact and oracle-reproducible.

    Non-image payload BYTES are nulled in the plan (JVM-side ``when``
    below the Arrow boundary): audio/video blobs are the heaviest columns
    here and would otherwise be serialized into Python per batch only to
    be discarded — same below-the-boundary pattern as ``sample_frames``,
    but keeping the one-row-per-input NULL semantics a filter would lose.
    """
    if out_side <= 0 or IMAGE_SIDE % out_side != 0:
        raise ValueError(
            f"out_side must be a positive divisor of {IMAGE_SIDE}, "
            f"got {out_side}")
    factor = IMAGE_SIDE // out_side

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, mtype in zip(pdf[payload_col], pdf["media_type"]):
                if payload is None or mtype != "image":
                    out.append(None)
                    continue
                px = decode_payload(payload, mtype, fake=fake) \
                    .reshape(IMAGE_SIDE, IMAGE_SIDE)
                small = px.reshape(out_side, factor, out_side, factor) \
                    .mean(axis=(1, 3))
                out.append([float(v) for v in small.ravel()])
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": pdf["media_type"],
                "resized": out,
            })

    return df.select(
        id_col, "media_type",
        F.when(F.col("media_type") == "image",
               F.col(payload_col)).alias(payload_col)) \
        .mapInPandas(resize, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id",
                  payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Uniform frame sampling from VIDEO payloads (task spec), exploded rows.

    Decodes each video payload to its ``VIDEO_FRAMES x FRAME_LEN`` frame
    grid and emits one row per sampled frame ``(doc_id, frame_idx,
    frame_vec)``, frames picked at evenly spaced indices over the clip
    (``linspace(0, VIDEO_FRAMES-1, n_frames)`` rounded — the ffmpeg
    "uniform keyframe thumbnail" pattern).  Non-video rows are filtered
    OUT IN THE PLAN (a JVM-side predicate below the UDF, so image/audio
    payloads never cross the Arrow boundary); NULL payloads explode to
    zero rows, matching ``explode(NULL)`` semantics.
    """
    if not 1 <= n_frames <= VIDEO_FRAMES:
        raise ValueError(
            f"n_frames must be in [1, {VIDEO_FRAMES}], got {n_frames}")
    # unique sorted indices: linspace rounding can collide for n close to
    # VIDEO_FRAMES only when n > frames, which the guard above excludes
    idx = np.unique(np.linspace(0, VIDEO_FRAMES - 1, n_frames)
                    .round().astype(int))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, vecs = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                frames = decode_payload(payload, "video", fake=fake) \
                    .reshape(VIDEO_FRAMES, FRAME_LEN)
                for i in idx:
                    ids.append(int(doc_id))
                    fidx.append(int(i))
                    vecs.append([float(v) for v in frames[i]])
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(fidx, dtype="int32"),
                                "frame_vec": pd.Series(vecs, dtype="object")})

    return df.filter(F.col("media_type") == "video") \
        .select(id_col, payload_col) \
        .mapInPandas(sample, schema=FRAME_SCHEMA)
