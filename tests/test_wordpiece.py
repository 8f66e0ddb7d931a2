"""WordPiece (r10): training semantics against a pure-Python replica,
greedy longest-match segmentation contract, UNK rule, and the
continuation-marking invariants — the third tokenizer family next to
BPE and unigram-LM, held to the same independent-reference discipline
as tests/test_unigram.py.
"""

from __future__ import annotations

import glob
from collections import Counter

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bqetl_spark.functions.wordpiece import (UNK, wordpiece_segments,
                                             wordpiece_train,
                                             wordpiece_vocab)


def _texts(sf_dir):
    f = glob.glob(f"{sf_dir}/documents.parquet")
    if not f:
        pytest.skip("corpus missing")
    return pq.read_table(f[0], columns=["text"]).to_pydict()["text"]


def _encode(word):
    return [word[0]] + ["##" + c for c in word[1:]]


def _strip(tok):
    return tok[2:] if tok.startswith("##") else tok


def _ref_train(texts, n_merges=8, mwl=12):
    """Pure-Python replica of wordpiece_train: likelihood-scored merges
    with the exact score_ppb = cnt·10^9 // (c_l·c_r) fixed point and
    (score DESC, l ASC, r ASC) tie-break."""
    wf = Counter()
    for t in texts:
        for w in (t or "").split():
            if w and len(w) <= mwl:
                wf[w] += 1
    vocab = {tuple(_encode(w)): f for w, f in wf.items()}
    merges = []
    for k in range(1, n_merges + 1):
        sym, pair = Counter(), Counter()
        for syms, f in vocab.items():
            for s in syms:
                sym[s] += f
            for i in range(len(syms) - 1):
                pair[(syms[i], syms[i + 1])] += f
        if not pair:
            break
        scored = {(l, r): cnt * 10**9 // (sym[l] * sym[r])
                  for (l, r), cnt in pair.items()}
        (l, r), score = min(scored.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merged = l + _strip(r)
        merges.append((k, l, r, merged, pair[(l, r)], score))
        new_vocab: dict[tuple, int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def _ref_segment(word, vocab, mtl=12):
    """Greedy longest-match-first; whole word -> [UNK] when stuck."""
    out, cur, n = [], 0, len(word)
    while cur < n:
        best = None
        for i in range(cur + 1, min(n, cur + mtl) + 1):
            tok = word[cur:i] if cur == 0 else "##" + word[cur:i]
            if tok in vocab:
                best = i
        if best is None:
            return [UNK]
        out.append(word[cur:best] if cur == 0 else "##" + word[cur:best])
        cur = best
    return out


def test_train_matches_pure_python_reference(spark, docs_df):
    ref = _ref_train(_texts("/root/testdata/sf0.001"), n_merges=8)
    got = [(r["rank"], r["left"], r["right"], r["merged"],
            r["pair_count"], r["score_ppb"])
           for r in wordpiece_train(docs_df, n_merges=8)
           .orderBy("rank").collect()]
    assert got == ref


def test_segments_match_pure_python_reference(spark, docs_df):
    texts = _texts("/root/testdata/sf0.001")
    merges = _ref_train(texts, n_merges=8)
    merged = [m[3] for m in merges]
    vocab_rows = {r["token"] for r in
                  wordpiece_vocab(docs_df, merged).collect()}
    # vocab = initial symbols ∪ merge tokens, by construction
    chars = set()
    for t in texts:
        for w in (t or "").split():
            if w and len(w) <= 12:
                chars |= set(_encode(w))
    assert vocab_rows == chars | set(merged)
    seg = (wordpiece_segments(docs_df.limit(20),
                              wordpiece_vocab(docs_df, merged))
           .orderBy("doc_id", "pos").collect())
    per_word = {}
    for r in seg:
        per_word.setdefault((r["doc_id"], r["pos"] // 1000), []).append(
            (r["pos"] % 1000, r["token"]))
    dtexts = {r["doc_id"]: r["text"]
              for r in docs_df.limit(20).select("doc_id", "text").collect()}
    checked = 0
    for (doc_id, wpos), toks in per_word.items():
        word = dtexts[doc_id].split()[wpos]
        got = [t for _, t in sorted(toks)]
        assert got == _ref_segment(word, vocab_rows), (doc_id, word)
        assert "".join(_strip(t) for t in got) == word
        checked += 1
    assert checked > 50


def test_unk_on_unknown_character(spark):
    train = spark.createDataFrame([(0, "low lower")], ["doc_id", "text"])
    mt = wordpiece_train(train, n_merges=2)
    merged = [r["merged"] for r in mt.orderBy("rank").collect()]
    vocab = wordpiece_vocab(train, merged)
    # 'zap' has chars outside the training alphabet -> single [UNK];
    # 'low' still segments
    apply_docs = spark.createDataFrame([(9, "zap low")],
                                       ["doc_id", "text"])
    rows = (wordpiece_segments(apply_docs, vocab)
            .orderBy("pos").collect())
    assert rows[0]["token"] == UNK and rows[0]["pos"] == 0
    toks = [r["token"] for r in rows if r["pos"] >= 1000]
    assert "".join(_strip(t) for t in toks) == "low"


def test_continuation_marking(spark, docs_df):
    """Every non-initial token is '##'-prefixed, every initial one is
    not — the WordPiece position-in-word contract."""
    mt = wordpiece_train(docs_df, n_merges=4)
    merged = [r["merged"] for r in mt.orderBy("rank").collect()]
    seg = wordpiece_segments(docs_df.limit(30),
                             wordpiece_vocab(docs_df, merged))
    bad = (seg.filter(
        ((F.col("pos") % 1000 == 0) & F.col("token").startswith("##"))
        | ((F.col("pos") % 1000 != 0) & ~F.col("token").startswith("##")
           & (F.col("token") != UNK))).count())
    assert bad == 0


def test_long_words_dropped_consistently(spark):
    docs = spark.createDataFrame(
        [(0, "short " + "x" * 20), (1, "short words only")],
        ["doc_id", "text"])
    mt = wordpiece_train(docs, n_merges=2, max_word_len=12)
    merged = [r["merged"] for r in mt.orderBy("rank").collect()]
    seg = wordpiece_segments(docs, wordpiece_vocab(docs, merged),
                             max_word_len=12).collect()
    words = {r["doc_id"] * 1_000_000 + r["pos"] // 1000 for r in seg}
    assert words == {0, 1_000_000, 1_000_001, 1_000_002}


def test_validation_errors(spark, docs_df):
    with pytest.raises(ValueError, match="n_merges"):
        wordpiece_train(docs_df, n_merges=0)


def test_fertility_consistent_with_segments(spark, docs_df):
    from bqetl_spark.functions.wordpiece import wordpiece_fertility

    mt = wordpiece_train(docs_df, n_merges=8)
    merged = [r["merged"] for r in mt.orderBy("rank").collect()]
    vocab = wordpiece_vocab(docs_df, merged)
    segs = wordpiece_segments(docs_df, vocab)
    fert = wordpiece_fertility(docs_df, vocab)
    # totals must reconcile exactly with the segment stream
    tot = fert.groupBy().sum("n_subwords").collect()[0][0]
    assert tot == segs.count()
    rows = fert.collect()
    assert all(r["n_subwords"] >= r["n_words"] for r in rows)
    assert all(r["fertility_ppm"] ==
               r["n_subwords"] * 10**6 // r["n_words"] for r in rows)
    # greedy longest-match with every char in vocab: a word never emits
    # more subwords than characters
    assert all(r["max_word_subwords"] <= 12 for r in rows)
