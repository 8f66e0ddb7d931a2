"""Unigram-LM (SentencePiece-style) tokenizer: training semantics,
segmentation contract, the integer-ln margin audit, and the fertility
comparison against BPE (the r8-verdict acceptance criterion).

The load-bearing piece is ``_ref_train`` / ``_ref_segment``: a pure-
Python replica of functions/unigram.py's hard-EM arithmetic (seed →
Viterbi folds → on-path counting → prune), independent of BOTH engines,
so the Spark↔DuckDB hash match is cross-checked against a third
implementation and the one float op (floor(1e6·ln(total/c))) has its
margins measured on every (total, c) pair any iteration actually uses —
the tfidf/dsir audit discipline.
"""

from __future__ import annotations

import glob
import math
from collections import Counter

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bqetl_spark.functions.unigram import unigram_segments, unigram_train

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
INF = 10 ** 15


def _spans(word, mtl):
    return [(j, i, word[j:i]) for j in range(len(word))
            for i in range(j + 1, min(len(word), j + mtl) + 1)]


def _ref_train(texts, iters=2, keep_multi=24, mtl=6, mwl=12,
               seed_max=5000):
    """Pure-Python replica of unigram_train; returns (model dict
    token -> (cnt, nll_micro), every (total, c) ln operand pair)."""
    wf = Counter()
    for t in texts:
        for w in (t or "").split():
            if w and len(w) <= mwl:
                wf[w] += 1
    seed = Counter()
    for w, f in wf.items():
        for _, _, tok in _spans(w, mtl):
            seed[tok] += f
    chars = {t for t in seed if len(t) == 1}
    multi = sorted(((t, c) for t, c in seed.items() if len(t) > 1),
                   key=lambda x: (-x[1], x[0]))[:seed_max]
    vocab = {t: seed[t] for t in chars}
    vocab.update(dict(multi))
    ln_pairs = []
    for _ in range(iters):
        total = sum(vocab.values())
        cost = {}
        for t, c in vocab.items():
            ln_pairs.append((total, c))
            cost[t] = math.floor(1e6 * math.log(total / c))
        counts = Counter()
        for w, f in wf.items():
            sp = [(j, i, tok, cost[tok]) for j, i, tok in _spans(w, mtl)
                  if tok in cost]
            n = len(w)
            dp = [0] + [INF] * n
            for i in range(1, n + 1):
                dp[i] = min([dp[j] + c for j, ii, _, c in sp if ii == i],
                            default=INF)
            suf = [0] + [INF] * n          # suf[k] = cost of word[n-k:]
            for k in range(1, n + 1):
                suf[k] = min([c + suf[n - ii]
                              for j, ii, _, c in sp if j == n - k],
                             default=INF)
            for j, i, tok, c in sp:
                if dp[j] + c + suf[n - i] == dp[n]:
                    counts[tok] += f
        vocab = {t: counts.get(t, 0) + 1 for t in chars}
        vocab.update({t: c for t, c in counts.items()
                      if len(t) > 1 and c > 0})
    final_multi = sorted(((t, c) for t, c in vocab.items() if len(t) > 1),
                         key=lambda x: (-x[1], x[0]))[:keep_multi]
    kept = {t: vocab[t] for t in chars}
    kept.update(dict(final_multi))
    total = sum(kept.values())
    model = {}
    for t, c in kept.items():
        ln_pairs.append((total, c))
        model[t] = (c, math.floor(1e6 * math.log(total / c)))
    return model, ln_pairs


def _ref_segment(word, cost, mtl=6):
    """Viterbi + smallest-start backtrace with a trained cost table."""
    n = len(word)
    sp = [(j, i, cost[word[j:i]]) for j, i, _ in _spans(word, mtl)
          if word[j:i] in cost]
    dp = [0] + [INF] * n
    for i in range(1, n + 1):
        dp[i] = min([dp[j] + c for j, ii, c in sp if ii == i],
                    default=INF)
    bounds, pos = [n], n
    while pos > 0:
        pos = min(j for j, ii, c in sp
                  if ii == pos and dp[j] + c == dp[pos])
        bounds.insert(0, pos)
    return [word[bounds[k]:bounds[k + 1]]
            for k in range(len(bounds) - 1)]


def _texts(sf_dir):
    f = glob.glob(f"{sf_dir}/documents.parquet")
    if not f:
        pytest.skip("corpus missing")
    return pq.read_table(f[0], columns=["text"]).to_pydict()["text"]


def test_train_matches_pure_python_reference(spark, docs_df):
    ref, _ = _ref_train(_texts("/root/testdata/sf0.001"))
    got = {r["token"]: (r["cnt"], r["nll_micro"])
           for r in unigram_train(docs_df, iters=2,
                                  keep_multi=24).collect()}
    assert got == ref


def test_segments_match_pure_python_reference(spark, docs_df):
    model = unigram_train(docs_df, iters=2, keep_multi=24)
    cost = {r["token"]: r["nll_micro"] for r in model.collect()}
    seg = (unigram_segments(docs_df.limit(20), model)
           .orderBy("doc_id", "pos").collect())
    # group the emitted tokens back per (doc_id, word_pos) and compare
    # with the reference segmentation of the underlying word
    per_word = {}
    for r in seg:
        per_word.setdefault((r["doc_id"], r["pos"] // 1000), []).append(
            (r["pos"] % 1000, r["token"]))
    texts = {r["doc_id"]: r["text"]
             for r in docs_df.limit(20).select("doc_id", "text").collect()}
    checked = 0
    for (doc_id, wpos), toks in per_word.items():
        word = texts[doc_id].split()[wpos]
        got = [t for _, t in sorted(toks)]
        assert got == _ref_segment(word, cost), (doc_id, word)
        assert "".join(got) == word
        checked += 1
    assert checked > 50


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_unigram_ln_margin_on_gate_corpora(sf_dir):
    """Every (total, c) ln operand any EM iteration or the final model
    actually evaluates on the gate corpora must put 1e6·ln(total/c)
    far (>1e-3) from an integer, so a 1-ulp libm difference between
    JVM Math.log and DuckDB ln can never flip the floor()."""
    _, ln_pairs = _ref_train(_texts(sf_dir))
    assert len(ln_pairs) > 100
    for total, c in ln_pairs:
        v = 1e6 * math.log(total / c)
        assert abs(v - round(v)) > 1e-3, (sf_dir, total, c, v)


def test_chars_survive_and_cover(spark, docs_df):
    """Single characters always stay in the model (+1 smoothing), so
    every corpus word of length <= max_word_len is segmentable."""
    model = unigram_train(docs_df, iters=2, keep_multi=0)
    toks = {r["token"] for r in model.collect()}
    corpus_chars = set()
    for t in _texts("/root/testdata/sf0.001"):
        for w in (t or "").split():
            if len(w) <= 12:
                corpus_chars |= set(w)
    assert corpus_chars <= toks
    assert all(len(t) == 1 for t in toks)   # keep_multi=0 → chars only


def test_fertility_unigram_beats_bpe(spark, docs_df):
    """The r8-verdict acceptance criterion: fertility (subword tokens
    per word) of the trained unigram model vs the 8-merge BPE on the
    same corpus. The unigram model (24 multi-char tokens learned
    globally by EM) must segment strictly tighter than the 8-merge BPE
    vocabulary — pinned so a regression in either trainer shows up as
    a relative, not absolute, drift."""
    from bqetl_spark.functions.bpe import bpe_fertility, bpe_train

    model = unigram_train(docs_df, iters=2, keep_multi=24)
    seg = unigram_segments(docs_df, model)
    n_words = (docs_df.select(F.explode(F.split(F.trim("text"), r"\s+"))
                              .alias("w"))
               .filter((F.col("w") != "") & (F.char_length("w") <= 12))
               .count())
    uni_fert = seg.count() / n_words
    merges = [(r["left"], r["right"])
              for r in bpe_train(docs_df, n_merges=8)
              .orderBy("rank").collect()]
    bpe = bpe_fertility(docs_df, merges).agg(
        (F.sum("n_subwords") / F.sum("n_words")).alias("f")).collect()
    bpe_fert = bpe[0]["f"]
    assert uni_fert < bpe_fert, (uni_fert, bpe_fert)
    assert uni_fert < 3.0      # sane absolute ceiling on this corpus


def test_validation_errors(spark, docs_df):
    with pytest.raises(ValueError, match="iters"):
        unigram_train(docs_df, iters=0)
    with pytest.raises(ValueError, match="max_token_len"):
        unigram_train(docs_df, max_token_len=1)
    with pytest.raises(ValueError, match="max_token_len"):
        unigram_train(docs_df, max_token_len=20, max_word_len=12)
    with pytest.raises(ValueError, match="keep_multi"):
        unigram_train(docs_df, keep_multi=-1)


def test_long_words_dropped_consistently(spark):
    """A word over max_word_len is excluded from BOTH training and
    segmentation (documented boundary) instead of half-participating."""
    docs = spark.createDataFrame(
        [(0, "short " + "x" * 20), (1, "short words only")],
        ["doc_id", "text"])
    model = unigram_train(docs, iters=1, keep_multi=4, max_word_len=12)
    toks = {r["token"] for r in model.collect()}
    assert "x" not in toks
    seg = unigram_segments(docs, model, max_word_len=12).collect()
    words = {r["doc_id"] * 1_000_000 + r["pos"] // 1000 for r in seg}
    # doc0 keeps only word 0 ("short"); the 20-char x-word emits nothing
    assert words == {0, 1_000_000, 1_000_001, 1_000_002}
