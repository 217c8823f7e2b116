"""Dedup / similarity operator invariants (SURVEY.md §2 group F).

Pins the round-2 scale-guard semantics:

* stop-gram pruning is a no-op when max_df doesn't bind, and strictly
  shrinks the inverted-index join when it does;
* hyperplane-LSH ANN has high recall on genuinely-near pairs (planted
  clusters, cosine >= 0.9) vs the brute-force truth;
* one-pass exploded SimHash equals an independent per-row NumPy oracle;
* portable MinHash signatures are deterministic and banding is sound
  (identical docs always collide; signature agreement tracks Jaccard).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from featureextraction_jl_spark.operators.dedup import (
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
)


def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


# ---------------------------------------------------------------------------
# Stop-gram pruning
# ---------------------------------------------------------------------------

def test_jaccard_pruning_noop_when_not_binding(spark, sf01_dir):
    d = spark.read.parquet(f"{sf01_dir}/documents.parquet")
    n_docs = d.count()
    max_df = int(0.97 * n_docs)
    # the q43 premise: 97% DF is above every gram's DF on this corpus
    grams = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(1, greatest(length(lower(text)) - 2, 1)),"
            " i -> substring(lower(text), i, 3))"))).alias("g"))
    top_df = grams.groupBy("g").count().agg(F.max("count")).collect()[0][0]
    assert top_df <= max_df, "corpus changed: q43's max_df choice now binds"

    base = ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5,
                               max_df=None).collect()  # truly unpruned
    pruned = ngram_jaccard_pairs(d, "text", "doc_id", n=3, threshold=0.5,
                                 max_df=max_df).collect()
    key = lambda rows: {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                        for r in rows}
    assert key(base) == key(pruned)


def test_jaccard_size_strategies_agree(spark):
    """VERDICT r03 #4: the window size-carry variant (shingle chain runs
    once) and the persisted-grams arm must reproduce the reagg reference
    exactly — pruned and unpruned."""
    rows = [(i, "xx" + format(i, "04d")) for i in range(20)]
    rows += [(100, "yyabcd"), (101, "yyabcd"), (102, "yyabce"), (103, None)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    key = lambda df: {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                      for r in df.collect()}
    for kw in ({}, {"max_df": 5}):
        ref = key(ngram_jaccard_pairs(d, "text", "doc_id", n=2,
                                      threshold=0.01, **kw))
        win = key(ngram_jaccard_pairs(d, "text", "doc_id", n=2, threshold=0.01,
                                      size_strategy="window", **kw))
        per = key(ngram_jaccard_pairs(d, "text", "doc_id", n=2, threshold=0.01,
                                      persist_grams=True, **kw))
        assert win == ref and per == ref
    spark.catalog.clearCache()
    with pytest.raises(ValueError, match="size_strategy"):
        ngram_jaccard_pairs(d, size_strategy="nope")


def test_jaccard_pruning_binds_on_hot_grams(spark):
    # "xx" appears in every doc (the hot gram); unique tails differentiate.
    rows = [(i, "xx" + format(i, "04d")) for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    unpruned = ngram_jaccard_pairs(d, "text", "doc_id", n=2, threshold=0.01)
    pruned = ngram_jaccard_pairs(d, "text", "doc_id", n=2, threshold=0.01,
                                 max_df=5)
    # every doc shares gram "xx" -> all 190 pairs as candidates unpruned;
    # pruning the universal gram removes those join rows entirely
    assert len(_pairs(unpruned)) == 190
    assert len(_pairs(pruned)) < 190


# ---------------------------------------------------------------------------
# ANN recall vs brute force on planted near-dup clusters
# ---------------------------------------------------------------------------

def test_ann_lsh_recall_on_planted_clusters(spark):
    rng = np.random.default_rng(123)
    dim, n_clusters, per_cluster, n_noise = 32, 12, 3, 200
    vecs, vid = [], 0
    for _ in range(n_clusters):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(per_cluster):
            v = base + rng.normal(scale=0.03, size=dim)  # cosine ~0.99
            vecs.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(n_noise):
        vecs.append((vid, [float(x) for x in rng.normal(size=dim)]))
        vid += 1
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    got = embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.9,
                                   n_planes=6, n_tables=8)
    found = _pairs(got)

    # brute-force truth
    X = np.stack([np.asarray(v) for _, v in vecs])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    truth = {(i, j) for i in range(len(vecs)) for j in range(i + 1, len(vecs))
             if S[i, j] >= 0.9}
    # most planted within-cluster pairs clear 0.9 (noise can push a few under)
    assert len(truth) >= 30
    recall = len(found & truth) / len(truth)
    # theory: bit-agree p ~ 0.986 at cos 0.999 => per-table ~0.92,
    # 8 tables => ~1 - 1e-9; assert a conservative floor
    assert recall >= 0.95, f"LSH recall {recall:.3f} < 0.95"
    # and everything emitted really is above the threshold
    for r in got.collect():
        assert r["cosine"] >= 0.9


def test_ann_bucket_cap_drops_degenerate_buckets(spark):
    rng = np.random.default_rng(5)
    # 50 near-identical vectors -> one mega-bucket in every table
    base = rng.normal(size=16)
    rows = [(i, [float(x) for x in base + rng.normal(scale=1e-3, size=16)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    uncapped = embedding_near_dup_pairs(df, "embedding", "vec_id",
                                        threshold=0.5, n_planes=4, n_tables=2)
    assert len(_pairs(uncapped)) == 50 * 49 // 2
    # Both cap strategies implement the same semantics: "window" (one
    # upstream pass, pathological bucket buffered in one window task) and
    # "broadcast" (map-side anti-join drop, extra upstream pass) — the
    # design-scale tradeoff is in the docstring; outputs must be identical.
    for strategy in ("window", "broadcast"):
        capped = embedding_near_dup_pairs(df, "embedding", "vec_id",
                                          threshold=0.5, n_planes=4,
                                          n_tables=2, max_bucket=10,
                                          cap_strategy=strategy)
        assert len(_pairs(capped)) == 0, strategy  # every bucket wider than cap
    with pytest.raises(ValueError, match="cap_strategy"):
        embedding_near_dup_pairs(df, "embedding", "vec_id", max_bucket=10,
                                 cap_strategy="nope").collect()
    # Mixed corpus — a mega-bucket that trips the cap PLUS small planted
    # pairs that survive it: the two strategies must emit the same pair set.
    planted = []
    for j in range(5):
        b = rng.normal(size=16) * (1 + j)
        for k in range(2):
            planted.append((100 + 2 * j + k,
                            [float(x) for x in b + rng.normal(scale=1e-3, size=16)]))
    mixed = spark.createDataFrame(rows + planted,
                                  "vec_id long, embedding array<double>")
    got = {}
    for strategy in ("window", "broadcast"):
        got[strategy] = _pairs(embedding_near_dup_pairs(
            mixed, "embedding", "vec_id", threshold=0.5, n_planes=4,
            n_tables=2, max_bucket=10, cap_strategy=strategy))
    assert got["window"] == got["broadcast"]
    assert len(got["window"]) >= 5  # the planted small-bucket pairs survive


# ---------------------------------------------------------------------------
# SimHash: one-pass exploded plan equals an independent NumPy oracle
# ---------------------------------------------------------------------------

def test_simhash_matches_numpy_oracle(spark):
    import hashlib

    texts = ["the quick brown fox", "the quick brown fix",
             "completely different words here", "ab", ""]
    d = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"]
           for r in simhash(d, "text", "doc_id", bits=16, n=3,
                            portable=True).collect()}

    def oracle(text: str, bits: int = 16, n: int = 3) -> int:
        t = text.lower()
        upper = max(len(t) - (n - 1), 1)
        grams = list(dict.fromkeys(t[i:i + n] for i in range(upper)))
        hashes = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                  for g in grams]
        fp = 0
        for b in range(bits):
            vote = sum(1 if (h >> b) & 1 else -1 for h in hashes)
            if vote > 0:
                fp |= 1 << b
        return fp

    for i, t in enumerate(texts):
        assert got[i] == oracle(t), f"doc {i} ({t!r})"


def test_simhash_production_bits64_xxhash64_matches_oracle(spark):
    """VERDICT r03 #6: pin the PRODUCTION parameters (bits=64, xxhash64
    grams) on a planted corpus — the one-pass rewrite was value-verified
    only at the portable bits=16 setting before.  Gram hashes are read back
    from Spark's own shingle_hashes (xxhash64 is a Spark built-in); what the
    Python oracle verifies independently is the per-bit conditional-SUM
    voting and the fingerprint assembly across all 64 bits, including the
    bit-63 shiftleft that lands on Long.MIN (sign-sensitive)."""
    import random

    from featureextraction_jl_spark.operators.dedup import shingle_hashes

    rnd = random.Random(1234)
    words = [f"w{i}" for i in range(40)]
    texts = [" ".join(rnd.choices(words, k=rnd.randrange(0, 30)))
             for _ in range(200)]
    texts += [texts[0], texts[1] + " tail", "ab", ""]   # dup, near-dup, short, empty
    d = spark.createDataFrame(list(enumerate(texts)),
                              "doc_id long, text string").repartition(7)

    got = {r["doc_id"]: r["simhash"]
           for r in simhash(d, "text", "doc_id", bits=64, n=3).collect()}
    grams = {r["doc_id"]: r["h"]
             for r in d.select("doc_id",
                               shingle_hashes("text", 3).alias("h")).collect()}

    def oracle64(hashes: list[int]) -> int:
        hs = list(dict.fromkeys(hashes))   # engine array_distinct
        fp = 0
        for b in range(64):
            # Python's >> on negative ints is arithmetic, like Spark's
            # shiftright on long — bit extraction matches exactly.
            vote = sum(1 if (h >> b) & 1 else -1 for h in hs)
            if vote > 0:
                fp |= 1 << b
        return fp - (1 << 64) if fp >= (1 << 63) else fp   # to signed long

    assert any(oracle64(grams[i]) < 0 for i in range(len(texts))), \
        "corpus must exercise the bit-63 / Long.MIN assembly path"
    for i in range(len(texts)):
        assert got[i] == oracle64(grams[i]), f"doc {i}"


def test_simhash_near_texts_have_close_fingerprints(spark):
    d = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy cat"),
         (2, "zzz completely unrelated corpus entry qqq")],
        "doc_id long, text string")
    fp = {r["doc_id"]: r["simhash"]
          for r in simhash(d, "text", "doc_id", bits=64).collect()}
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")
    assert ham(fp[0], fp[1]) < ham(fp[0], fp[2])
    assert ham(fp[0], fp[1]) < ham(fp[1], fp[2])


# ---------------------------------------------------------------------------
# MinHash determinism + banding soundness
# ---------------------------------------------------------------------------

def test_minhash_identical_docs_always_collide(spark):
    d = spark.createDataFrame(
        [(0, "shared near duplicate document body"),
         (1, "shared near duplicate document body"),
         (2, "some altogether different text payload")],
        "doc_id long, text string")
    for portable in (False, True):
        pairs = _pairs(minhash_lsh_pairs(d, "text", "doc_id", num_hashes=16,
                                         bands=4, k=4, portable=portable))
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs


def test_minhash_cache_banded_equivalence(spark):
    """cache_banded persists the banded frame across the two self-join
    sides (see scripts/bench_q41.py for the recompute A/B); the candidate
    pair set must be identical."""
    d = spark.createDataFrame(
        [(i, ("dup text body shared " if i % 3 == 0 else f"unique {i} ") * 3)
         for i in range(30)], "doc_id long, text string")
    base = _pairs(minhash_lsh_pairs(d, "text", "doc_id", num_hashes=16,
                                    bands=4, k=4))
    cached = _pairs(minhash_lsh_pairs(d, "text", "doc_id", num_hashes=16,
                                      bands=4, k=4, cache_banded=True))
    spark.catalog.clearCache()
    assert base == cached and len(base) >= 1


def test_minhash_signature_deterministic(spark):
    d = spark.createDataFrame([(0, "alpha beta gamma delta")],
                              "doc_id long, text string")
    s1 = minhash_signature(d, "text", "doc_id", 8, 4, portable=True).collect()
    s2 = minhash_signature(d, "text", "doc_id", 8, 4, portable=True).collect()
    assert s1[0]["signature"] == s2[0]["signature"]
    assert len(s1[0]["signature"]) == 8


# ---------------------------------------------------------------------------
# Connected components / near-dedup survivors
# ---------------------------------------------------------------------------

def test_connected_components_chain_and_isolated(spark):
    from featureextraction_jl_spark.operators.dedup import (
        connected_components, near_dedup_survivors)

    # chain 0-1-2-3 (diameter 3 => needs >1 propagation round), pair 10-11,
    # isolated 20
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 10, 11, 20]],
                                "doc_id long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs, ids, "doc_id").collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20}

    docs = ids.withColumn("text", F.concat(F.lit("doc"), "doc_id"))
    surv = {r["doc_id"] for r in near_dedup_survivors(docs, pairs).collect()}
    assert surv == {0, 10, 20}


def test_connected_components_random_graphs_vs_union_find(spark):
    """Randomized F11 gate: Spark min-label CC vs an independent union-find
    oracle on random sparse graphs (isolated nodes, multi-edges, chains)."""
    import random

    from featureextraction_jl_spark.operators.dedup import connected_components

    for seed in (1, 2, 3):
        rnd = random.Random(seed)
        n = 40
        raw = [(rnd.randrange(n), rnd.randrange(n)) for _ in range(30)]
        edges = [(a, b) for a, b in raw if a != b] or [(0, 1)]

        parent = list(range(n))

        def find(u):
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # roots only ever merge toward the smaller id, so the final root of
        # every set IS its minimum member — the engine's cluster_id contract
        expect = {u: find(u) for u in range(n)}

        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        got = {r["doc_id"]: r["cluster_id"]
               for r in connected_components(pairs, ids, "doc_id").collect()}
        assert got == expect, f"seed {seed}"


def test_connected_components_caches_edges_upstream_once(spark):
    """The edge frame is localCheckpoint-ed ONCE at entry (VERDICT r2 #1):
    each propagation round must NOT re-execute the upstream candidate-pair
    pipeline.  An accumulator-instrumented mapInPandas source counts
    upstream partition evaluations: the union inside connected_components
    references pairs twice, so the one eager checkpoint job evaluates the
    source exactly twice — any per-round recompute on this >=3-round chain
    would push the count to >= 6."""
    from featureextraction_jl_spark.operators.dedup import connected_components

    acc = spark.sparkContext.accumulator(0)
    base = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "id_a long, id_b long").coalesce(1)

    def mark(batches):
        acc.add(1)
        yield from batches

    pairs = base.mapInPandas(mark, base.schema)

    # ids is likewise eagerly checkpointed at entry (VERDICT r03 #5): its
    # upstream (source -> distinct) must run exactly once, in the checkpoint
    # job, not again inside round 1's first join.
    acc_ids = spark.sparkContext.accumulator(0)
    ids_base = spark.createDataFrame(
        [(i,) for i in range(5)], "doc_id long").coalesce(1)

    def mark_ids(batches):
        acc_ids.add(1)
        yield from batches

    ids = ids_base.mapInPandas(mark_ids, ids_base.schema)
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs, ids, "doc_id").collect()}
    assert got == {i: 0 for i in range(5)}
    assert acc.value == 2, f"upstream evaluated {acc.value}x (expected 2: one checkpoint job, union reads source twice)"
    assert acc_ids.value == 1, f"ids evaluated {acc_ids.value}x (expected 1: the eager labels checkpoint job)"


def _signed64(v: int) -> int:
    """Python int -> the signed 64-bit value Spark's long column stores."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def test_simhash_pairs_exact_vs_bruteforce(spark):
    """simhash_pairs must return EXACTLY the pairs whose fingerprints differ
    in <= max_hamming bits (pigeonhole banding loses nothing at
    bands >= max_hamming + 1), with the correct hamming value."""
    from featureextraction_jl_spark.operators.dedup import simhash_pairs

    base = ("the quick brown fox jumps over the lazy dog and then naps "
            "in the warm afternoon sun beside the river")
    texts = [base, base + " again", base.replace("quick", "swift"),
             "completely unrelated text about spark shuffle partitions",
             base.replace("lazy", "sleepy"), "short", base + " once more"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    fps = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    want = {}
    for i in fps:
        for j in fps:
            if i < j:
                h = bin((fps[i] ^ fps[j]) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    want[(i, j)] = h
    got = {(r.id_a, r.id_b): r.hamming
           for r in simhash_pairs(df, max_hamming=3).collect()}
    assert got == want


def test_simhash_pairs_pigeonhole_adversarial_bits(spark):
    """Bit-level recall proof points: flips concentrated in ONE band, spread
    over several bands, one flip in EVERY band (the pigeonhole boundary —
    must be excluded at max_hamming = bands - 1), and a sign-bit flip
    (shiftrightunsigned, not shiftright, on the top segment)."""
    from featureextraction_jl_spark.operators.dedup import (
        simhash_pairs_from_fingerprints)

    base = 0x0F0F0F0F0F0F0F0F
    rows = [
        (0, base),
        (1, base ^ 0b111),                                  # 3 flips, band 0
        (2, base ^ (1 | (1 << 20) | (1 << 40))),            # 3 bands hit
        (3, base ^ (1 | (1 << 20) | (1 << 40) | (1 << 60))),  # ALL 4 bands
        (4, base ^ (1 << 63)),                              # sign bit only
    ]
    fps = spark.createDataFrame([(i, _signed64(v)) for i, v in rows],
                                "doc_id long, simhash long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in simhash_pairs_from_fingerprints(
               fps, max_hamming=3).collect()}
    # (0,3) has hamming 4 with one corrupted bit in EVERY band: correctly
    # absent; everything at <= 3 present with exact distances
    assert got == {(0, 1): 3, (0, 2): 3, (2, 3): 1, (0, 4): 1}


def test_simhash_pairs_validates_banding(spark):
    from featureextraction_jl_spark.operators.dedup import (
        simhash_pairs_from_fingerprints)

    fps = spark.createDataFrame([(0, 0)], "doc_id long, simhash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_pairs_from_fingerprints(fps, max_hamming=3, bands=3)
    with pytest.raises(ValueError, match="exceeds fingerprint bits"):
        simhash_pairs_from_fingerprints(fps, max_hamming=70)
    # bits > 64 would push segment offsets past 63, where the JVM masks
    # the shift amount (x >>> 64 == x) and high segments silently alias
    # low bits — under-recall with no error; both entry points refuse
    with pytest.raises(ValueError, match="64-bit long"):
        simhash_pairs_from_fingerprints(fps, max_hamming=3, bits=128)
    from featureextraction_jl_spark.operators.dedup import simhash
    docs = spark.createDataFrame([(0, "abcdef")], "doc_id long, text string")
    with pytest.raises(ValueError, match="64-bit long"):
        simhash(docs, bits=128)


def test_simhash_pairs_degenerate_corpus_bounded(spark):
    """Every empty/short doc fingerprints to the same value -> one bucket
    per band; the max_bucket cap must keep the self-join bounded (same
    guard class as minhash_lsh_pairs)."""
    from featureextraction_jl_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(i, "") for i in range(3000)],
                               "doc_id long, text string")
    assert simhash_pairs(df, max_bucket=100).count() == 0
    # and with the cap lifted at tiny scale, the pairs are all hamming 0
    tiny = spark.createDataFrame([(i, "") for i in range(4)],
                                 "doc_id long, text string")
    rows = simhash_pairs(tiny, max_bucket=None).collect()
    assert len(rows) == 6 and all(r.hamming == 0 for r in rows)


def test_simhash_pairs_compose_with_survivors(spark):
    """The pair frame feeds near_dedup_survivors like the LSH pairs do."""
    from featureextraction_jl_spark.operators.dedup import (
        near_dedup_survivors, simhash_pairs)

    base = ("the quick brown fox jumps over the lazy dog and then naps "
            "in the warm afternoon sun beside the river")
    df = spark.createDataFrame(
        [(0, base), (1, base + "."), (2, "unrelated text entirely "
                                         "about something else")],
        "doc_id long, text string")
    # trailing-dot variant measures hamming 4 from base; unrelated is ~36
    pairs = simhash_pairs(df, max_hamming=6)
    surv = {r.doc_id for r in near_dedup_survivors(df, pairs).collect()}
    assert surv == {0, 2}


def test_connected_components_empty_ids_returns_empty(spark):
    """Code-review r05: a 0-row id set must converge trivially (empty
    labels frame), not spin to max_iter on a NULL convergence sum and
    raise a misleading non-convergence error."""
    from featureextraction_jl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    ids = spark.createDataFrame([], "doc_id long")
    out = connected_components(pairs, ids, "doc_id")
    assert out.columns == ["doc_id", "cluster_id"]
    assert out.count() == 0


def test_connected_components_non_numeric_ids_raise_clearly(spark):
    """The sum-based convergence probe is only sound for numeric-castable
    labels; non-numeric string ids must fail loudly at round 1, not fake
    convergence or exhaust max_iter."""
    from featureextraction_jl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    ids = spark.createDataFrame([("a",), ("b",), ("c",)], "doc_id string")
    with pytest.raises(TypeError, match="numeric"):
        connected_components(pairs, ids, "doc_id")


def test_connected_components_raises_when_unconverged(spark):
    """ADVICE r2: exiting via max_iter without a sum fixpoint must raise,
    not silently return under-merged labels."""
    from featureextraction_jl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    with pytest.raises(RuntimeError, match="fixed point"):
        connected_components(pairs, ids, "doc_id", max_iter=1)


def test_simhash_null_text_and_duplicate_ids_keep_row_semantics(spark):
    """ADVICE r2: the one-pass explode+groupBy path must emit one row per
    INPUT row — fingerprint 0 for null/unhashable text, duplicate ids not
    collapsed (matching the original per-row implementation)."""
    d = spark.createDataFrame(
        [(0, None), (1, "the quick brown fox"), (1, "the quick brown fox"),
         (2, None)],
        "doc_id long, text string")
    rows = simhash(d, "text", "doc_id", bits=16).collect()
    assert len(rows) == 4
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(r["simhash"])
    # NULL text still yields exactly one row with a deterministic constant
    # fingerprint (xxhash64 over a null gram hashes to the seed), shared by
    # every null-text doc — and duplicate ids are NOT collapsed.
    assert len(by_id[0]) == 1 and by_id[0] == by_id[2]
    assert len(by_id[1]) == 2 and by_id[1][0] == by_id[1][1] != by_id[0][0]


def test_jaccard_max_df_frac_equals_absolute_max_df(spark):
    """max_df_frac resolves the same threshold INSIDE the plan (no separate
    driver-side count action) — results must match the absolute form."""
    rows = [(i, "xx" + format(i, "04d")) for i in range(20)]
    rows += [(100, "yyab"), (101, "yyab")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    key = lambda df: {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                      for r in df.collect()}
    absolute = ngram_jaccard_pairs(d, "text", "doc_id", n=2, threshold=0.01,
                                   max_df=5)
    # 22 docs * 0.25 = 5.5 (exact in binary float): DF > 5.5 <=> DF > 5 for
    # integer DF — same cut as the absolute form, no float-boundary risk.
    frac = ngram_jaccard_pairs(d, "text", "doc_id", n=2, threshold=0.01,
                               max_df_frac=0.25)
    assert key(absolute) == key(frac)
    assert len(key(frac)) >= 1  # the yyab near-dup pair survives pruning


def test_q43_plan_build_runs_no_scan_action(spark, sf01_dir):
    """The q43 stop-gram threshold resolves INSIDE the plan: constructing the
    DataFrame must not trigger a corpus-scan action (the round-2 form ran a
    full d.count() — a task-per-partition job — at build time just to set
    the pruning constant).  spark.read.parquet itself may launch a 1-task
    footer/schema-inference job; that is metadata, not a scan, so the gate
    is on total TASKS launched during build, not on job count."""
    import __spark_entry__ as entrymod

    tracker = spark.sparkContext.statusTracker()
    spark.sparkContext.setJobGroup("q43lazy", "q43 build probe")
    try:
        df = entrymod.queries()["q43_ngram_jaccard"](spark, sf01_dir)
    finally:
        spark.sparkContext.setJobGroup("q43done", "")
    built_jobs = tracker.getJobIdsForGroup("q43lazy")
    tasks = 0
    for jid in built_jobs:
        jinfo = tracker.getJobInfo(jid)
        for sid in (jinfo.stageIds if jinfo else []):
            sinfo = tracker.getStageInfo(sid)
            if sinfo:
                tasks += sinfo.numTasks
    assert tasks <= 2, (
        f"plan build launched a scan-sized action: jobs={sorted(built_jobs)} "
        f"total_tasks={tasks}")
    assert df.columns == ["id_a", "id_b", "jaccard"]


def test_ann_null_and_ragged_embeddings_filtered(spark):
    """NULL / ragged / null-element embeddings (routine in scraped corpora)
    are dropped up front instead of crashing np.stack mid-stage; a
    null-first-row corpus still dim-probes, and an all-null corpus returns
    an empty frame with the right schema."""
    rng = np.random.default_rng(9)
    base = rng.normal(size=8)
    good = [(i, [float(x) for x in base + rng.normal(scale=1e-3, size=8)])
            for i in range(2)]
    bad = [(11, [1.0, 2.0]),                        # wrong length
           (12, [float("nan")] * 7 + [None])]       # null element
    # null row FIRST: the dim probe must skip past it (len(None) would
    # fail on the driver) and adopt the first valid row's length
    df = spark.createDataFrame([(10, None)] + good + bad,
                               "vec_id long, embedding array<double>")
    got = embedding_near_dup_pairs(df, "embedding", "vec_id",
                                   threshold=0.9, n_planes=2, n_tables=4)
    assert _pairs(got) == {(0, 1)}
    all_null = spark.createDataFrame([(1, None), (2, None)],
                                     "vec_id long, embedding array<double>")
    empty = embedding_near_dup_pairs(all_null, "embedding", "vec_id")
    assert empty.columns == ["id_a", "id_b", "cosine"]
    assert empty.count() == 0


def test_minhash_max_bucket_caps_degenerate_buckets(spark):
    """Degenerate texts (empty/near-empty) all share one signature, so m
    such docs put m rows in one (band, band_hash) bucket -> m^2 join rows;
    max_bucket drops those buckets while real near-dup pairs survive."""
    degenerate = [(i, "") for i in range(20)]
    real = [(100, "the quick brown fox jumps over the lazy dog"),
            (101, "the quick brown fox jumps over the lazy dogs")]
    d = spark.createDataFrame(degenerate + real, "doc_id long, text string")
    # exact LSH semantics now require opting OUT of the finite default cap
    uncapped = _pairs(minhash_lsh_pairs(d, num_hashes=16, bands=4, k=4,
                                        max_bucket=None))
    capped = _pairs(minhash_lsh_pairs(d, num_hashes=16, bands=4, k=4,
                                      max_bucket=10))
    assert (100, 101) in uncapped and len(uncapped) >= 20 * 19 // 2
    assert capped == {(100, 101)}


def test_minhash_default_caps_degenerate_corpus(spark):
    """The PRODUCTION DEFAULT must survive a degenerate corpus (VERDICT r04
    "what's wrong" #2): 10^5 empty-text docs share ONE signature, so the
    uncapped join would emit ~10^10 rows per band.  With the default finite
    max_bucket the degenerate buckets are dropped in bounded time and real
    near-dups still surface."""
    import inspect

    default = inspect.signature(minhash_lsh_pairs).parameters["max_bucket"].default
    assert default is not None and default > 0  # pin: cap ON by default
    n = 100_000
    degenerate = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("").alias("text"))
    real = spark.createDataFrame(
        [(n + 1, "the quick brown fox jumps over the lazy dog"),
         (n + 2, "the quick brown fox jumps over the lazy dogs")],
        "doc_id long, text string")
    d = degenerate.unionByName(real)
    got = _pairs(minhash_lsh_pairs(d, num_hashes=16, bands=4, k=4))
    assert got == {(n + 1, n + 2)}


def test_exact_dedup_digest_pair_not_functionally_dependent(spark):
    """ADVICE r04: xxhash64 folds children left-to-right with the running
    hash as the next seed, so d2's seed constant must be the FIRST child —
    constant-last makes d2 = XXH64(const, seed=d1), a pure function of d1
    (any d1 collision implies a d2 collision: 64-bit, not ~128-bit,
    resistance).  Pins (a) the child order of the shipped expression and
    (b) that the shipped d2 differs from the broken constant-last form."""
    from featureextraction_jl_spark.operators.dedup import (
        DEDUP_SEED_WORD,
        content_digests,
        exact_dedup,
    )

    import re

    d1, d2 = content_digests("text")
    # (a) expression-order pin: the literal is the first xxhash64 child
    # (the long literal may render with an L suffix)
    assert re.fullmatch(
        rf"Column<'xxhash64\({DEDUP_SEED_WORD}L?, text\)'>", str(d2)), str(d2)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["", "a", "ab", "the quick brown fox",
                                       "the quick brown fox!", "xyz" * 40])],
        "doc_id long, text string")
    rows = df.select(
        d1.alias("d1"), d2.alias("d2"),
        F.xxhash64(F.col("text"), F.lit(DEDUP_SEED_WORD)).alias("d2_broken"),
    ).collect()
    # (b) the shipped d2 is NOT the constant-last fold, and the pair is
    # collision-free across distinct texts
    assert all(r["d2"] != r["d2_broken"] for r in rows)
    assert len({(r["d1"], r["d2"]) for r in rows}) == len(rows)
    # end-to-end: exact_dedup still keeps min-id per identical text
    dup = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "doc_id long, text string")
    assert {r["doc_id"] for r in exact_dedup(dup).collect()} == {1, 3}


def test_connected_components_reliable_checkpoint_dir(spark, tmp_path):
    """VERDICT r04 next #4: with a checkpoint dir configured the iterative
    lineage truncation must use RELIABLE checkpoint() (executor-loss-safe on
    a real cluster) and produce output identical to the localCheckpoint
    path; checkpoint files must actually land in the dir."""
    import os

    from featureextraction_jl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    ids = spark.createDataFrame([(i,) for i in [0, 1, 2, 3, 10, 11, 20]],
                                "doc_id long")
    local = {r["doc_id"]: r["cluster_id"]
             for r in connected_components(pairs, ids, "doc_id").collect()}
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None  # precondition: default is local
    sc.setCheckpointDir(str(tmp_path / "ccdir"))
    try:
        rel = {r["doc_id"]: r["cluster_id"]
               for r in connected_components(pairs, ids, "doc_id").collect()}
        assert rel == local == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20}
        written = []
        for root, _dirs, files in os.walk(tmp_path / "ccdir"):
            written += files
        assert written, "no reliable checkpoint files were written"
    finally:
        # unset so later tests in the shared session stay on localCheckpoint
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None))
        assert sc.getCheckpointDir() is None


def test_ngram_default_caps_degenerate_corpus(spark):
    """The PRODUCTION DEFAULT of ngram_jaccard_pairs must survive a
    degenerate corpus (policy parity with minhash max_bucket): 5k
    empty-text docs all share the single xxhash64(NULL) gram — unguarded
    that key alone emits ~12.5M join rows (10^14 at 10^7 docs).  With the
    default max_df the stop-gram is pruned in bounded time and the real
    near-dup pair is still found."""
    n = 5000
    degenerate = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("").alias("text"))
    real = spark.createDataFrame(
        [(n + 1, "the quick brown fox jumps over the lazy dog"),
         (n + 2, "the quick brown fox jumps over the lazy dogs")],
        "doc_id long, text string")
    d = degenerate.unionByName(real)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(d, "text", "doc_id", n=3,
                                          threshold=0.5).collect()}
    assert (n + 1, n + 2) in pairs
    assert all(a == n + 1 and b == n + 2 for a, b in pairs)


def test_ngram_df_thresholds_compose(spark):
    """When max_df AND max_df_frac are both given, a gram exceeding EITHER
    is pruned — the default absolute cap must not shadow an explicit frac
    (q43 passes max_df_frac under the default max_df)."""
    docs = [(i, "xy shared") for i in range(8)] + [(100, "xy"), (101, "xy")]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    # frac binds far below the absolute cap: "xy"-grams appear in all 10
    # docs (df=10 > 0.5*10) -> pruned even though df << max_df=2000
    got = ngram_jaccard_pairs(d, "text", "doc_id", n=2, threshold=0.01,
                              max_df=2000, max_df_frac=0.5).collect()
    shared_only = {(r["id_a"], r["id_b"]) for r in got}
    assert (100, 101) not in shared_only  # all their grams were ubiquitous


def test_cap_bucket_width_rejects_nonpositive(spark):
    """max_bucket=0/negative is ambiguous and the literal filter would
    silently drop EVERY band row (near-dedup off, no error) — the library
    raises; the CLI's '0 disables' maps 0 -> None before it gets here."""
    from featureextraction_jl_spark.operators.dedup import (
        cap_bucket_width,
        embedding_near_dup_pairs,
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame([(1, 0, 7)], "doc_id long, band int, band_hash long")
    with pytest.raises(ValueError, match="positive"):
        cap_bucket_width(df, ["band", "band_hash"], 0)
    with pytest.raises(ValueError, match="positive"):
        cap_bucket_width(df, ["band", "band_hash"], -1)
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    with pytest.raises(ValueError, match="positive"):
        minhash_lsh_pairs(docs, max_bucket=0)
    vecs = spark.createDataFrame([(1, [1.0, 0.0])],
                                 "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="positive"):
        embedding_near_dup_pairs(vecs, "embedding", "vec_id",
                                 max_bucket=0).collect()


def test_exact_dedup_null_id_raises(spark):
    """A NULL id used to vanish silently (min(id) skips NULLs; the
    semi-join never matches NULL=NULL) — now the plan raises loudly at
    execution, matching connected_components' malformed-id convention."""
    from featureextraction_jl_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame([(1, "keep me"), (None, "unique text")],
                               "doc_id long, text string")
    with pytest.raises(Exception, match="NULL doc_id"):
        exact_dedup(df).collect()
    ok = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, text string")
    assert exact_dedup(ok).count() == 1
