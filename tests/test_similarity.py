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
