"""tfidf_doc_pairs: squared-cosine rational + df-cap invariants."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from bqetl_spark.functions.retrieval import tfidf_doc_pairs

CORPUS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma delta"),          # identical to 1
    (3, "alpha beta epsilon zeta"),         # half-overlaps 1/2
    (4, "eta theta iota kappa"),            # disjoint
    (5, "eta theta iota kappa lam mu"),
]


def _python_pairs(corpus, min_cos2_ppm=0, max_df=50):
    n = len(corpus)
    tf = {d: Counter(t.split()) for d, t in corpus}
    df = Counter(t for d in tf.values() for t in d)
    keep = {t for t, c in df.items() if 2 <= c <= max_df}
    w = {d: {t: c * math.floor(1000 * math.log(n / df[t]))
             for t, c in cnt.items() if t in keep}
         for d, cnt in tf.items()}
    out = {}
    ids = sorted(w)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = sum(w[a][t] * w[b][t] for t in shared)
            na = sum(v * v for v in w[a].values())
            nb = sum(v * v for v in w[b].values())
            c = dot * dot * 10**6 // (na * nb)
            if c >= min_cos2_ppm:
                out[(a, b)] = (len(shared), c)
    return out


def test_matches_python_replica(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): (r["n_shared"], r["cos2_ppm"])
           for r in tfidf_doc_pairs(df, min_cos2_ppm=0).collect()}
    assert got == _python_pairs(CORPUS)


def test_identical_docs_score_exactly_one(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): r["cos2_ppm"]
           for r in tfidf_doc_pairs(df, min_cos2_ppm=0).collect()}
    assert got[(1, 2)] == 10**6
    # half-overlap scores strictly between disjoint (absent) and identical
    assert 0 < got[(1, 3)] < 10**6
    assert (1, 4) not in got


def test_df_cap_excludes_hot_terms_from_space(spark):
    """A term in EVERY doc must not create pairs nor inflate norms: with
    the cap at 2, only the df<=2 terms define the space."""
    corpus = [(1, "common alpha x1"), (2, "common alpha x2"),
              (3, "common x3 x4")]
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {(r["doc_a"], r["doc_b"]): r["cos2_ppm"]
           for r in tfidf_doc_pairs(df, min_cos2_ppm=0, max_df=2).collect()}
    # 'common' (df=3) is out; 'alpha' (df=2) pairs docs 1,2 — and in the
    # pruned space it is each doc's ONLY term, so the pair is exact 1.0
    assert got == {(1, 2): 10**6}


def test_threshold_prunes(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    keep = {(r["doc_a"], r["doc_b"])
            for r in tfidf_doc_pairs(df, min_cos2_ppm=900_000).collect()}
    # (4,5) survives too: doc 5's extra terms have df=1 and fall out of
    # the pruned space, leaving identical vectors
    assert keep == {(1, 2), (4, 5)}


def test_validation(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="min_cos2_ppm"):
        tfidf_doc_pairs(df, min_cos2_ppm=-1)
    with pytest.raises(ValueError, match="max_df"):
        tfidf_doc_pairs(df, max_df=1)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_idf_e3_ln_margin_on_gate_corpora(sf_dir):
    """floor(1e3·ln(N/df)) for every OBSERVED (N, df) in the capped
    band: the coarser 1e3 scale sits proportionally closer to integer
    boundaries than tfidf's 1e6, so audit it separately."""
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    t = pq.read_table(files[0], columns=["text"]).to_pydict()["text"]
    docs = [set((x or "").split()) for x in t if x and x.strip()]
    n = len(docs)
    df = Counter(tok for d in docs for tok in d)
    for c in {v for v in df.values() if 2 <= v <= 50}:
        val = 1000 * math.log(n / c)
        assert abs(val - round(val)) > 1e-6, (n, c, val)
