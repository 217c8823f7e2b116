"""Deduplication operators (SURVEY.md §2 C9 + training-data-pipeline extras).

Exact and near-duplicate detection over the ``documents`` table, each scoped
for 100 TB: hashing/shuffling on content digests (never the text itself where
avoidable), band-bucketed LSH joins instead of O(n^2) pairs, and built-in
JVM expressions for the hashing hot path (xxhash64 / hash / shingles via
higher-order functions) — Python only where NumPy is genuinely needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_row(df: DataFrame, key, order_desc) -> DataFrame:
    """Keep the newest row per key (C9): row_number over desc order == 1."""
    key = [key] if isinstance(key, str) else list(key)
    order_desc = [order_desc] if isinstance(order_desc, str) else list(order_desc)
    w = Window.partitionBy(*key).orderBy(*[F.col(c).desc() for c in order_desc])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: keep the min-id row per content digest.

    Shuffles on a 64-bit digest, not the document body — at 100 TB the
    shuffle payload is (digest, id), then a self-semi-join retrieves
    survivors.  Normalization is deliberately none: byte-exact dedup.
    """
    digests = df.select(id_col, F.xxhash64(F.col(text_col)).alias("__digest"))
    keep = digests.groupBy("__digest").agg(F.min(id_col).alias(id_col))
    return df.join(keep.select(id_col), on=id_col, how="left_semi")


def shingle_hashes(text_col: str, k: int = 5):
    """array<long> of xxhash64 over character k-grams — pure JVM (no UDF).

    sequence + transform + substr stay inside whole-stage codegen; each
    position yields the xxhash64 of its lowercase k-gram.
    """
    t = F.lower(F.col(text_col))
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n),
                       lambda i: F.xxhash64(t.substr(i, F.lit(k))))


def portable_gram_hash(gram):
    """60-bit hash any ANSI engine can reproduce: first 15 hex chars of md5.

    xxhash64 is Spark-specific; md5 is everywhere (DuckDB oracle:
    ``('0x' || substr(md5(g), 1, 15))::BIGINT``).  60 bits keeps the value
    positive in an int64.  Slower than xxhash64 — use only where
    cross-engine verification matters; the scale path stays on xxhash64.
    """
    return F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")


def portable_shingle_hashes(text_col: str, k: int = 5):
    """Portable-hash twin of :func:`shingle_hashes` (md5-based, oracle-able)."""
    t = F.lower(F.col(text_col))
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n),
                       lambda i: portable_gram_hash(t.substr(i, F.lit(k))))


def minhash_signature(df: DataFrame, text_col: str, id_col: str,
                      num_hashes: int = 32, k: int = 5) -> DataFrame:
    """MinHash signatures: shingle -> num_hashes permutations -> min each.

    Carter–Wegman permutation family h_i(x) = (a_i*x + b_i) mod p with
    p = 2^31 - 1; operands reduced below 2^31 first so the int64 product
    never overflows.  Seeds fixed => deterministic signatures.
    All array higher-order functions — no Python worker.
    """
    p = 2147483647  # 2^31 - 1, Mersenne prime
    import random

    rnd = random.Random(42)
    coefs = [(rnd.randrange(1, p), rnd.randrange(0, p)) for _ in range(num_hashes)]

    # Explode shingles once, then 32 partial+final min-aggregates over the
    # hashed long column — the shingle hash is computed exactly once per
    # gram (array-lambda variants re-evaluate the whole shingle array per
    # permutation after Catalyst's project collapse: 32x the work).
    grams = df.select(
        id_col, F.explode(F.array_distinct(shingle_hashes(text_col, k))).alias("__h"))
    hh = F.abs(F.col("__h")) % F.lit(p)
    aggs = [
        F.min((hh * F.lit(a) + F.lit(b)) % F.lit(p)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(coefs)
    ]
    sig = grams.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"mh_{i}" for i in range(num_hashes)])
                      .alias("signature"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 32,
                      bands: int = 8, k: int = 5) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    signature -> ``bands`` bands of r = num_hashes/bands rows; documents
    sharing any band hash become a candidate pair via an equi self-join on
    (band_idx, band_hash) — the scale path: no O(n^2), shuffle keys are
    (band, hash) with naturally bounded bucket sizes.
    Returns distinct (id_a, id_b) with id_a < id_b.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, num_hashes, k)
    banded = sig.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(F.slice("signature", b * r + 1, r).cast("string")),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "band_hash"], how="inner")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs that share at least one n-gram.

    Inverted-index join on n-gram hash (|intersection| via groupBy count),
    set sizes joined in, Jaccard = inter / (|A| + |B| - inter).  Shuffles
    (ngram_hash, id) — the standard scalable set-similarity plan.
    """
    grams = df.select(
        id_col,
        F.explode(F.array_distinct(shingle_hashes(text_col, n))).alias("g"),
    )
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(b, on="g")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64, n: int = 3, portable: bool = False) -> DataFrame:
    """64-bit SimHash fingerprint per document, JVM-side.

    Per bit b: sum over n-gram hashes of sign(bit b of hash); fingerprint
    bit = 1 iff sum > 0.  aggregate() over the shingle array — no UDF.
    ``portable=True`` swaps xxhash64 for the md5-based 60-bit hash so the
    result is reproducible in any SQL engine (DuckDB oracle-checkable).
    """
    mk = portable_shingle_hashes if portable else shingle_hashes
    grams = F.array_distinct(mk(text_col, n))

    def vote(b: int):
        def step(acc, h):
            sign = F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1,
                          F.lit(1)).otherwise(F.lit(-1))
            return acc + sign
        return F.aggregate(grams, F.lit(0).cast("long"), step)

    # Distinct powers of two never carry, so summing set bits is exact
    # (bit 63 lands on Long.MIN via shiftleft, still no overflow).
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(vote(b) > 0,
                         F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
    return df.select(id_col, fp.alias("simhash"))


def embedding_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             threshold: float = 0.95,
                             n_planes: int = 8) -> DataFrame:
    """Embedding-cosine near-dup via random-hyperplane LSH buckets.

    Bucket = sign pattern under ``n_planes`` fixed random hyperplanes; exact
    cosine computed only within buckets (JVM zip_with/aggregate dot product).
    Scale path: candidate generation is an equi-join on the bucket key.
    """
    import numpy as np

    rng = np.random.default_rng(7)
    first = df.select(vec_col).first()
    dim = len(first[vec_col])
    planes = rng.normal(size=(n_planes, dim))

    def dot_with(plane):
        arr = F.array(*[F.lit(float(v)) for v in plane])
        return F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), arr, lambda x, y: x * y),
            F.lit(0.0), lambda acc, v: acc + v)

    bucket = F.concat_ws("", *[F.when(dot_with(p) >= 0, "1").otherwise("0") for p in planes])
    tagged = df.select(id_col, F.col(vec_col).cast("array<double>").alias("__v"),
                       bucket.alias("__bucket"))
    norm = F.sqrt(F.aggregate(F.transform("__v", lambda x: x * x), F.lit(0.0),
                              lambda a, v: a + v))
    tagged = tagged.withColumn("__n", norm)
    a, b = tagged.alias("a"), tagged.alias("b")
    dot = F.aggregate(F.zip_with(F.col("a.__v"), F.col("b.__v"), lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    return (
        a.join(b, on="__bucket")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("cosine", dot / (F.col("a.__n") * F.col("b.__n")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"), "cosine")
    )
