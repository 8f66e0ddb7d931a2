"""tfidf_topk: scoring semantics, determinism, and the idf margin audit
that underwrites the cross-engine oracle (floor(1e6·ln(N/df)) must not
sit within float noise of an integer boundary on the gate corpora)."""

from __future__ import annotations

import glob
import math

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bqetl_spark.functions.retrieval import IDF_SCALE, bm25_topk, tfidf_topk

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
QUERY = ["spark", "shuffle", "window"]


@pytest.fixture
def docs(spark):
    rows = [
        (1, "apple banana apple"),        # tf(apple)=2
        (2, "apple cherry"),
        (3, "banana banana banana"),
        (4, "cherry date elderberry"),
        (5, "fig"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_scores_match_hand_computation(docs):
    n = 5
    idf_apple = math.floor(IDF_SCALE * math.log(n / 2))   # docs 1,2
    idf_banana = math.floor(IDF_SCALE * math.log(n / 2))  # docs 1,3
    got = {r["doc_id"]: (r["score"], r["rank"])
           for r in tfidf_topk(docs, ["apple", "banana"], k=5).collect()}
    # only docs containing a query term appear
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 2 * idf_apple + 1 * idf_banana
    assert got[3][0] == 3 * idf_banana
    assert got[2][0] == 1 * idf_apple
    # ranking: doc1 (tf 3) > doc3 (tf 3 same score? no -- equal idfs, doc1
    # scores 3*idf vs doc3 3*idf: tie broken by id)
    assert got[1][1] < got[3][1] or got[1][0] != got[3][0]


def test_rank_ties_break_by_doc_id(spark):
    df = spark.createDataFrame(
        [(10, "zebra"), (2, "zebra"), (7, "zebra")], ["doc_id", "text"])
    rows = tfidf_topk(df, ["zebra"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [2, 7, 10]
    assert [r["rank"] for r in rows] == [1, 2, 3]


def test_k_truncates(docs):
    assert tfidf_topk(docs, ["apple", "banana"], k=2).count() == 2


def test_validation(docs):
    with pytest.raises(ValueError):
        tfidf_topk(docs, [])
    with pytest.raises(ValueError):
        tfidf_topk(docs, ["a"], k=0)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_idf_margin_on_gate_corpora(sf_dir):
    """For every query term on the real corpora, 1e6·ln(N/df) must be far
    (>1e-3) from an integer, so a 1-ulp libm difference between Java's
    Math.log and DuckDB's log can never flip the floor()."""
    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    t = pq.read_table(files[0], columns=["text"]).to_pydict()
    texts = t["text"]
    n = len(texts)
    for term in QUERY:
        df_t = sum(1 for x in texts if term in (x or "").split())
        if df_t == 0:
            continue
        v = IDF_SCALE * math.log(n / df_t)
        frac = abs(v - round(v))
        assert frac > 1e-3, (term, sf_dir, v)


def test_topk_window_input_is_bounded(spark):
    """r7 (verdict item 7): tfidf_topk's unpartitioned rank Window runs
    over the already-limited top-k rows; the plan must show the limit
    below the Window so the single-partition stage is k-bounded."""
    from pyspark.sql import functions as F

    from bqetl_spark.functions.retrieval import tfidf_topk

    docs = spark.createDataFrame(
        [(i, "spark etl data " * (i % 7 + 1)) for i in range(200)],
        "doc_id long, text string")
    out = tfidf_topk(docs, ["spark", "data"], k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    wpos = plan.find("Window")
    lpos = max(plan.find("TakeOrderedAndProject"), plan.find("GlobalLimit"))
    assert wpos != -1 and lpos != -1 and wpos < lpos, plan
    assert out.count() <= 10


# --------------------------------------------------------------- BM25 --

def _bm25_py(corpus: dict[int, str], terms: list[str], k: int = 10):
    """Integer-exact Python reference for bm25_topk's arithmetic."""
    live = {d: t for d, t in corpus.items() if t.strip()}
    n = len(live)
    toks = {d: t.split() for d, t in live.items()}
    big_t = sum(len(v) for v in toks.values())
    df_t = {q: sum(1 for v in toks.values() if q in v) for q in terms}
    scores = {}
    for d, v in toks.items():
        dl = len(v)
        s = 0
        for q in terms:
            tf = v.count(q)
            if tf == 0 or df_t[q] == 0:
                continue
            idf = math.floor(
                IDF_SCALE * math.log((2 * n + 2) / (2 * df_t[q] + 1)))
            s += (idf * 22 * tf * big_t) // (
                10 * tf * big_t + 3 * big_t + 9 * dl * n)
        if s:
            scores[d] = s
    top = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(d, s, i + 1) for i, (d, s) in enumerate(top)]


def test_bm25_matches_python_reference(spark):
    corpus = {
        1: "apple banana apple apple",
        2: "apple cherry date fig grape kiwi lemon mango",
        3: "banana banana",
        4: "cherry date elderberry apple banana apple",
        5: "fig",
        6: "   ",
    }
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = [(r["doc_id"], r["score"], r["rank"])
           for r in bm25_topk(df, ["apple", "banana"], k=10).collect()]
    assert got == _bm25_py(corpus, ["apple", "banana"], k=10)


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc → higher BM25 (the thing tfidf can't do)."""
    df = spark.createDataFrame(
        [(1, "apple " + "pad " * 50), (2, "apple pad"),
         (3, "other words here entirely")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r["score"]
            for r in bm25_topk(df, ["apple"], k=5).collect()}
    assert rows[2] > rows[1]


def test_bm25_tf_saturation(spark):
    """Doubling tf must NOT double the score (k1 saturation) — in tfidf
    it exactly doubles."""
    df = spark.createDataFrame(
        [(1, "apple pad pad pad"), (2, "apple apple pad pad"),
         (3, "zebra only")],
        ["doc_id", "text"])
    rows = {r["doc_id"]: r["score"]
            for r in bm25_topk(df, ["apple"], k=5).collect()}
    assert rows[2] > rows[1]
    assert rows[2] < 2 * rows[1]


def test_bm25_validation(docs):
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk(docs, ["a"], k=0)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_bm25_idf_margin_on_gate_corpora(sf_dir):
    """Same floor-boundary audit as tfidf, for the Lucene-style
    1e6·ln((2N+2)/(2df+1)) the bm25_topk gate uses."""
    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    texts = pq.read_table(files[0], columns=["text"]).to_pydict()["text"]
    live = [x for x in texts if (x or "").strip()]
    n = len(live)
    for term in QUERY:
        df_t = sum(1 for x in live if term in x.split())
        if df_t == 0:
            continue
        v = IDF_SCALE * math.log((2 * n + 2) / (2 * df_t + 1))
        frac = abs(v - round(v))
        assert frac > 1e-3, (term, sf_dir, v)


def test_bm25_topk_window_input_is_bounded(spark):
    """Same k-bounded unpartitioned-Window proof as tfidf_topk."""
    docs = spark.createDataFrame(
        [(i, "spark etl data " * (i % 7 + 1)) for i in range(200)],
        "doc_id long, text string")
    out = bm25_topk(docs, ["spark", "data"], k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    wpos = plan.find("Window")
    lpos = max(plan.find("TakeOrderedAndProject"), plan.find("GlobalLimit"))
    assert wpos != -1 and lpos != -1 and wpos < lpos, plan
    assert out.count() <= 10


# hybrid_rrf (r11) -----------------------------------------------------------


def test_hybrid_rrf_hand_fusion(spark):
    """Exact replay on a hand-built pair of rankings: scores are
    1e6//(60+rank) sums, missing ranks contribute 0, ties break by id."""
    from bqetl_spark.functions.retrieval import hybrid_rrf

    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)],
                                ["doc_id", "rank"])
    dense = spark.createDataFrame([(20, 1), (40, 2)], ["doc_id", "rank"])
    out = {r["doc_id"]: r for r in
           hybrid_rrf(lex, dense, k=10).collect()}
    assert out[20]["rrf_score"] == 10**6 // 62 + 10**6 // 61  # both lists
    assert out[10]["rrf_score"] == 10**6 // 61                # lex only
    assert out[40]["rrf_score"] == 10**6 // 62                # dense only
    assert out[40]["lex_rank"] is None
    # ordering: 20 (both) first, then 10 (rank-1 lex), then 40, then 30
    ranks = sorted((r["rank"], d) for d, r in out.items())
    assert [d for _, d in ranks] == [20, 10, 40, 30]


def test_hybrid_rrf_k_limit_and_validation(spark):
    from bqetl_spark.functions.retrieval import hybrid_rrf
    import pytest as _pt

    lex = spark.createDataFrame([(i, i) for i in range(1, 9)],
                                ["doc_id", "rank"])
    dense = spark.createDataFrame([(i + 100, i) for i in range(1, 9)],
                                  ["doc_id", "rank"])
    assert hybrid_rrf(lex, dense, k=5).count() == 5
    with _pt.raises(ValueError):
        hybrid_rrf(lex, dense, k=0)


def test_ndcg_eval_hand_dcg(spark):
    """Hand replay: rel map {1:3, 2:1}, system ranks [1->doc1, 2->doc9
    (unknown, rel 0), 3->doc2]; ideal = best ordering of corpus rels."""
    from bqetl_spark.functions.retrieval import _dcg_discounts, ndcg_eval

    d = _dcg_discounts(3)
    rel = spark.createDataFrame([(1, 3), (2, 1), (3, 0)],
                                ["doc_id", "rel"])
    sysr = spark.createDataFrame([(1, 1), (9, 2), (2, 3)],
                                 ["doc_id", "rank"])
    out = ndcg_eval({"s": sysr}, rel, k=3).collect()
    assert len(out) == 1
    row = out[0]
    assert row["dcg_micro"] == 3 * d[0] + 0 * d[1] + 1 * d[2]
    assert row["ideal_micro"] == 3 * d[0] + 1 * d[1] + 0 * d[2]
    assert row["n_scored"] == 3
