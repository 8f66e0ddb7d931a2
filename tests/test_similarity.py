import math

from bqetl_spark.functions import similarity as sim


def _vecs(spark):
    # deterministic toy vectors in 4-d: 1≈2 (same direction), 3 orthogonal
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.5, 0.5, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_exact(spark):
    v = _vecs(spark)
    out = sim.cosine_topk(v, v.filter("vec_id = 1"), k=2)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in rows] == [2, 5]
    assert rows[0]["score"] > 0.99


def test_cosine_topk_rank_deterministic_on_ties(spark):
    v = _vecs(spark)
    out = sim.cosine_topk(v, v.filter("vec_id = 3"), k=4).collect()
    ranks = {r["neighbor_id"]: r["rank"] for r in out}
    # orthogonal vectors tie at 0 → tie-break by neighbor_id
    assert ranks[5] == 1
    tied = [nid for nid, rk in ranks.items() if nid in (1, 4)]
    assert sorted(tied) == [1, 4]


def test_neardup_pairs_threshold(spark):
    v = _vecs(spark)
    pairs = {(r["id_a"], r["id_b"]): r["score"]
             for r in sim.cosine_neardup_pairs(v, threshold=0.95).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_lsh_topk_recovers_close_neighbor(spark):
    v = _vecs(spark)
    out = sim.lsh_bucket_topk(v, v.filter("vec_id = 1"), k=3, dim=4,
                              n_tables=8, n_bits=2)
    rows = out.collect()
    assert any(r["neighbor_id"] == 2 for r in rows)  # nearest survives LSH


def test_lsh_is_subset_of_bruteforce_scores(spark):
    v = _vecs(spark)
    bf = {(r["query_id"], r["neighbor_id"]): r["score"]
          for r in sim.cosine_topk(v, v, k=4).collect()}
    ann = sim.lsh_bucket_topk(v, v, k=4, dim=4, n_tables=8, n_bits=2).collect()
    for r in ann:
        key = (r["query_id"], r["neighbor_id"])
        assert key in bf
        assert math.isclose(bf[key], r["score"], abs_tol=1e-9)


def test_semantic_dedup_precision_and_recall(spark):
    """Precision 1 by construction: every dropped doc has a genuine
    smaller-id near-dup globally (a within-cluster pair is a global pair).
    Recall vs the exact pruned scan is the documented cross-cluster loss —
    floor it on the real embeddings table."""
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    kept = sim.semantic_dedup(emb, threshold=0.45, n_lists=8, iters=2)
    kept_ids = {r["vec_id"] for r in kept.collect()}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    dropped = all_ids - kept_ids

    exact = sim.cosine_neardup_pairs(emb, threshold=0.45).collect()
    has_smaller_dup = {r["id_b"] for r in exact}
    # precision: only docs with a real smaller-id duplicate were dropped
    assert dropped <= has_smaller_dup
    # recall floor: the within-cluster restriction must still find most
    if has_smaller_dup:
        assert len(dropped) / len(has_smaller_dup) >= 0.5


def test_semantic_dedup_keeps_all_when_no_dups(spark):
    v = _vecs(spark)  # tiny corpus, nothing above 0.999
    kept = sim.semantic_dedup(v, threshold=0.9999, n_lists=2, iters=1)
    assert kept.count() == v.count()


def test_sq_topk_recall_vs_exact(spark):
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id < 10")
    exact = sim.cosine_topk(emb, queries, k=5)
    quant = sim.sq_cosine_topk(emb, queries, k=5)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    qz = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    recall = len(ex & qz) / len(ex)
    # int8 max-abs quantization keeps neighbor ordering almost intact
    assert recall >= 0.8, f"sq recall {recall}"


def test_sq_scores_close_to_exact(spark):
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id < 3")
    exact = {(r["query_id"], r["neighbor_id"]): r["score"]
             for r in sim.cosine_topk(emb, queries, k=5).collect()}
    quant = {(r["query_id"], r["neighbor_id"]): r["score"]
             for r in sim.sq_cosine_topk(emb, queries, k=5).collect()}
    both = set(exact) & set(quant)
    assert both
    for key in both:
        assert abs(exact[key] - quant[key]) < 0.02


def test_hard_negatives_label_filter_and_null_safety(spark):
    """r6: negatives must carry a DIFFERENT label than the query,
    null-safely — NULL-label corpus rows ARE negatives for labeled
    queries, NULL-label queries treat every labeled row as a negative,
    and two NULL labels are the SAME label (excluded)."""
    from bqetl_spark.functions.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 1),      # same label as 0 -> never a negative of 0
        (2, [0.8, 0.2], 2),
        (3, [0.7, 0.3], None),   # NULL label
        (4, [0.0, 1.0], None),   # NULL label
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, "
                                     "label int")
    out = hard_negatives(df, df, k=10).collect()
    pairs = {(r["query_id"], r["neighbor_id"]) for r in out}
    assert (0, 1) not in pairs and (1, 0) not in pairs   # same label
    assert (3, 4) not in pairs and (4, 3) not in pairs   # NULL == NULL
    assert (0, 3) in pairs and (3, 0) in pairs           # NULL vs 1 differ
    # ranking: for query 0 the closest different-label vector is 2
    q0 = sorted((r["rank"], r["neighbor_id"]) for r in out
                if r["query_id"] == 0)
    assert q0[0] == (1, 2)
    # schema carries both labels for downstream batch construction
    cols = {f.name for f in hard_negatives(df, df, k=1).schema.fields}
    assert {"query_label", "neighbor_label"} <= cols


def test_learned_ivf_params_rule():
    """r8: n_lists = largest power of two <= isqrt(n), capped;
    n_probe = n_lists/4 (>=1)."""
    import pytest

    from bqetl_spark.functions.similarity import learned_ivf_params

    assert learned_ivf_params(1) == (1, 1)
    assert learned_ivf_params(3) == (1, 1)
    assert learned_ivf_params(4) == (2, 1)
    assert learned_ivf_params(1000) == (16, 4)      # isqrt 31
    assert learned_ivf_params(10_000) == (64, 16)   # isqrt 100
    assert learned_ivf_params(10_000_000) == (1024, 256)  # capped
    assert learned_ivf_params(10_000_000, max_lists=4096) == (2048, 512)
    with pytest.raises(ValueError):
        learned_ivf_params(0)


def test_ivf_learned_matches_fixed_at_sf0001(spark):
    """At sf0.001 (500 vectors, isqrt 22 -> 16 lists / 4 probes) the
    learned variant must equal ivf_topk called with those params."""
    from bqetl_spark.functions.similarity import ivf_topk, ivf_topk_learned
    from bqetl_spark.sources.parquet_source import load_parquet_table

    emb = load_parquet_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter("vec_id < 5")
    got = sorted(map(tuple, ivf_topk_learned(emb, q, k=3).collect()))
    want = sorted(map(tuple, ivf_topk(emb, q, k=3, n_lists=16,
                                      n_probe=4).collect()))
    assert got == want and len(got) > 0


def test_ivf_assign_frozen_centroids(spark):
    """r11: assignment against FROZEN centroids — every vector lands in
    its argmax-cosine list with ascending-list tie-break; assignment of
    a centroid's own vector returns that centroid's list; empty
    centroid table raises."""
    import pytest as _pt

    from bqetl_spark.functions.similarity import ivf_assign

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["list_id", "centroid"])
    vecs = spark.createDataFrame(
        [(10, [0.9, 0.1]), (11, [0.1, 0.9]), (12, [1.0, 1.0])],
        ["vec_id", "embedding"])
    got = {r["vec_id"]: r["list_id"]
           for r in ivf_assign(vecs, cents).collect()}
    assert got == {10: 0, 11: 1, 12: 0}   # exact tie -> ascending list_id
    with _pt.raises(ValueError, match="non-empty"):
        ivf_assign(vecs, cents.limit(0))
