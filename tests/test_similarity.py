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
