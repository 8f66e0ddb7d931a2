"""token_embeddings / token_embed_topk: PPMI + signed-projection
invariants and the ln floor-margin audit."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from bqetl_spark.functions.text import token_embed_topk, token_embeddings

TEXTS = ["the cat sat on the mat", "the dog sat on the rug",
         "a cat and a dog and a bird", "the bird sat on the cat",
         "dogs and cats and birds"] * 3


def _sign(k, c):
    return 1 - 2 * (int(hashlib.md5(f"{k}:{c}".encode()).hexdigest()[0],
                        16) % 2)


def _py_embed(texts, window=2, dim=16, min_pair=2, scale=1000):
    cnt = Counter()
    for t in texts:
        w = t.split()
        if len(w) < 2:
            continue
        for off in range(1, window + 1):
            for i in range(len(w) - off):
                cnt[(w[i], w[i + off])] += 1
                cnt[(w[i + off], w[i])] += 1
    cnt = {p: v for p, v in cnt.items() if v >= min_pair}
    tot = sum(cnt.values())
    nt, nc = Counter(), Counter()
    for (t, c), n in cnt.items():
        nt[t] += n
        nc[c] += n
    emb = {}
    for (t, c), n in cnt.items():
        ratio = (float(n) * float(tot)) / (float(nt[t]) * nc[c])
        p = max(math.floor(scale * math.log(ratio)), 0)
        if p <= 0:
            continue
        e = emb.setdefault(t, [0] * dim)
        for k in range(dim):
            e[k] += _sign(k, c) * p
    return emb


def test_embeddings_match_python_replica(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = {r["tok"]: [r[f"e{k}"] for k in range(16)]
           for r in token_embeddings(df).collect()}
    assert got == _py_embed(TEXTS)


def test_identical_context_distributions_give_identical_vectors(spark):
    """The distributional hypothesis, literally: two tokens whose
    co-occurrence rows are identical must get the SAME vector — the
    projection depends only on (context, ppmi) pairs."""
    texts = [f"x{i} alpha y{i} . x{i} beta y{i}" for i in range(4)] * 2
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {r["tok"]: [r[f"e{k}"] for k in range(16)]
           for r in token_embeddings(df, min_pair=2).collect()}
    assert got["alpha"] == got["beta"]


def test_topk_ranks_context_mates_first(spark):
    """'cat' and 'dog' share their frame ('the _ sat/and a _') — each
    probe's top hits must include the other over unrelated fillers."""
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    rows = token_embed_topk(df, n_probes=5, k=5).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["probe"], []).append(r["tok"])
    assert "cat" in by_probe and "dog" in by_probe["cat"][:5]
    # ranks are 1..k, dense, and cos2 is within [0, 1e6]
    for r in rows:
        assert 1 <= r["rnk"] <= 5 and 0 < r["cos2_ppm"] <= 10**6


def test_deterministic_across_partitionings(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    a = sorted(map(tuple, token_embed_topk(df, n_probes=3, k=3).collect()))
    b = sorted(map(tuple, token_embed_topk(df.repartition(7), n_probes=3,
                                           k=3).collect()))
    assert a == b


def test_validation_and_empty(spark):
    df = spark.createDataFrame([("a b",)], ["text"])
    with pytest.raises(ValueError, match="window"):
        token_embeddings(df, window=0)
    with pytest.raises(ValueError, match="min_pair"):
        token_embeddings(df, min_pair=0)
    with pytest.raises(ValueError, match="n_probes"):
        token_embed_topk(df, n_probes=0)
    empty = spark.createDataFrame([("",), ("solo",)], ["text"])
    assert token_embeddings(empty).count() == 0
    assert token_embed_topk(empty).count() == 0


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_ppmi_ln_margin_on_gate_corpora(sf_dir):
    """Every OBSERVED PPMI operand quadruple (n, T, n_t, n_c) on the
    gate corpora: 1e3·ln((n·T)/(n_t·n_c)) must sit > 1e-6 from an
    integer (including 0 — the clamp boundary is the same floor)."""
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    texts = pq.read_table(files[0], columns=["text"]).to_pydict()["text"]
    cnt = Counter()
    for t in texts:
        w = (t or "").split()
        for off in (1, 2):
            for i in range(len(w) - off):
                cnt[(w[i], w[i + off])] += 1
                cnt[(w[i + off], w[i])] += 1
    cnt = {p: v for p, v in cnt.items() if v >= 2}
    tot = sum(cnt.values())
    nt, nc = Counter(), Counter()
    for (t, c), n in cnt.items():
        nt[t] += n
        nc[c] += n
    seen = {(n, nt[t], nc[c]) for (t, c), n in cnt.items()}
    for n, a, b in seen:
        v = 1000 * math.log((float(n) * float(tot)) / (float(a) * b))
        assert abs(v - round(v)) > 1e-6, (n, a, b, v)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_doc_embed_component_overflow_margin(sf_dir):
    """doc_embed_topk exactness audit (ADVICE r11): the DECIMAL(38,0)
    cos2 numerator dot²·10⁶ stays exact only while every pooled doc
    component |c| < √(10¹⁶/dim) ≈ 2.5·10⁷ at dim=16 (dot ≤ dim·c²).
    Beyond it Spark silently NULLs on decimal overflow while DuckDB
    HUGEINT errors — a silent cross-engine divergence, so the bound
    must be AUDITED, not assumed. Replays the tf-weighted sum pooling
    of the _py_embed replica on each gate corpus and asserts ≥100×
    margin, tracking the ceiling as corpora grow."""
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(f"{sf_dir}/documents.parquet")
    if not files:
        pytest.skip("corpus missing")
    texts = pq.read_table(files[0], columns=["text"]).to_pydict()["text"]
    emb = _py_embed([t or "" for t in texts])
    worst = 0
    for t in texts:
        pooled = [0] * 16
        cnt = Counter((t or "").split())
        for tok, tf in cnt.items():
            e = emb.get(tok)
            if e:
                for k in range(16):
                    pooled[k] += tf * e[k]
        worst = max(worst, max(abs(v) for v in pooled), key=abs)
    bound = math.isqrt(10**16 // 16)            # ≈ 2.5e7
    assert worst < bound / 100, (
        f"max pooled |component| {worst} within 100x of the "
        f"DECIMAL(38,0) exactness ceiling {bound} — right-shift the "
        f"pooled components (doc_embed_topk docstring) before the "
        f"oracle silently diverges")


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_doc_embed_ann_recall_floor(spark, sf_dir):
    """doc_embed_ann is approximate by DESIGN (a probe's true neighbor
    can live in an unprobed list) — the hard_negatives_ann pattern pins
    its recall against the exact tier. At the gate geometry (16 lists,
    6 probed) measured recall is 1.0 on every gate corpus; the floor
    asserts >= 0.9 so a geometry or corpus regression surfaces here
    instead of as a silent quality loss."""
    from bqetl_spark.caching import release_pinned
    from bqetl_spark.functions.text import doc_embed_ann, doc_embed_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {(r["probe_doc"], r["doc_id"])
             for r in doc_embed_topk(docs).collect()}
    ann = {(r["probe_doc"], r["doc_id"])
           for r in doc_embed_ann(docs, n_lists=16,
                                  n_probe_lists=6).collect()}
    release_pinned()
    assert exact, "exact tier returned nothing — corpus unusable"
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.9, f"ANN recall {recall:.3f} < 0.9 vs exact"


def test_doc_embed_ann_validates(spark):
    from bqetl_spark.functions.text import doc_embed_ann

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    for kw in ({"n_probes": 0}, {"k": 0}, {"n_lists": 1},
               {"n_probe_lists": 0}, {"n_lists": 4, "n_probe_lists": 5}):
        with pytest.raises(ValueError):
            doc_embed_ann(df, **kw)
