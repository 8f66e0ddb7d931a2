"""BPE merge-table training (functions/bpe.py): classic-example
correctness, greedy-left merge semantics, apply-roundtrip, bounded
plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bqetl_spark.functions.bpe import bpe_apply, bpe_train, word_freq_table


def _docs(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_bpe_learns_sennrich_example(spark):
    """The canonical low/lower/newest/widest corpus: 'es' -> 'est' ->
    'est</w>' -> 'lo' -> 'low' is the published merge order."""
    docs = _docs(spark, " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))
    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
           for r in bpe_train(docs, n_merges=5).orderBy("rank").collect()]
    assert got == [(1, "e", "s", "es", 9), (2, "es", "t", "est", 9),
                   (3, "est", "</w>", "est</w>", 9),
                   (4, "l", "o", "lo", 7), (5, "lo", "w", "low", 7)]


def test_bpe_greedy_left_merge(spark):
    """'aaaa' under merge (a,a) must segment greedy-left to ['aa','aa'],
    and the next round's pair counts must see 'aa aa', not overlaps."""
    docs = _docs(spark, " ".join(["aaaa"] * 3))
    got = [(r["left"], r["right"], r["pair_count"])
           for r in bpe_train(docs, n_merges=2).orderBy("rank").collect()]
    # round 1: (a,a) count 9 (3 per word, greedy-independent counting);
    # round 2: vocab is ' aa  aa  </w> ' -> (aa,aa) 3 and (aa,</w>) 3,
    # tie broken by left/right asc -> ('aa','</w>')
    assert got[0] == ("a", "a", 9)
    assert got[1] == ("aa", "</w>", 3)


def test_bpe_early_stop(spark):
    """Single-char words run out of pairs (only c</w> merges exist);
    asking for more merges than exist returns the short table."""
    docs = _docs(spark, "a b a b a")
    got = bpe_train(docs, n_merges=10).collect()
    # merges: (a,</w>), (b,</w>) then nothing
    assert len(got) == 2
    assert {(r["left"], r["right"]) for r in got} == {("a", "</w>"),
                                                     ("b", "</w>")}


def test_bpe_apply_roundtrip(spark):
    """Applying the learned merges segments every word into subwords
    that concatenate back to word + '</w>' — lossless segmentation."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                    + ["widest"] * 3)
    docs = _docs(spark, text)
    merges = [(r["left"], r["right"])
              for r in bpe_train(docs, n_merges=5).orderBy("rank").collect()]
    toks = (bpe_apply(docs, merges).orderBy("pos")
            .select("token").collect())
    joined = "".join(r["token"] for r in toks)
    want = "".join(w + "</w>" for w in text.split())
    assert joined == want
    # and 'low' occurrences segment to the single learned token
    assert sum(1 for r in toks if r["token"] == "low") >= 5


def test_word_freq_guards(spark):
    docs = _docs(spark, "x x x y y z")
    wf = {r["word"]: r["freq"]
          for r in word_freq_table(docs, min_freq=2).collect()}
    assert wf == {"x": 3, "y": 2}
    top = word_freq_table(docs, max_vocab=1).collect()
    assert [(r["word"], r["freq"]) for r in top] == [("x", 3)]


def test_bpe_train_no_python_row_path(spark):
    """The per-iteration aggregation is pure Catalyst — no Python eval
    in the pairs plan (the only Python is the 1-row argmax collect)."""
    docs = _docs(spark, "ab ab cd")
    vocab = word_freq_table(docs).selectExpr(
        "word", "freq",
        "concat(' ', array_join(concat(transform(sequence(1, "
        "char_length(word)), i -> substring(word, i, 1)), "
        "array('</w>')), '  '), ' ') AS s")
    sym = F.split(F.trim(F.col("s")), "  ")
    pairs = (vocab.select("freq", sym.alias("sym"))
             .filter(F.size("sym") >= 2)
             .select("freq", F.explode(F.expr(
                 "transform(sequence(1, size(sym) - 1), i -> "
                 "struct(element_at(sym, i) AS l, "
                 "element_at(sym, i + 1) AS r))")).alias("p"))
             .groupBy("p.l", "p.r").agg(F.sum("freq").alias("cnt")))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "PythonEval" not in plan and "ArrowEval" not in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_bpe_collected_matches_distributed(spark):
    """The production-shape in-process trainer must produce the SAME
    merge table as the distributed loop — algorithm, greedy semantics
    and tie-breaks included."""
    from bqetl_spark.functions.bpe import bpe_train_collected

    docs = spark.createDataFrame(
        [(1, "low low low lower newest newest newest widest aaaa aaaa"),
         (2, "the quick brown fox the quick brown the quick the")],
        "doc_id long, text string")
    dist = [tuple(r) for r in bpe_train(docs, n_merges=10)
            .orderBy("rank").collect()]
    local = [tuple(r) for r in bpe_train_collected(docs, n_merges=10)
             .orderBy("rank").collect()]
    assert dist == local


def test_bpe_apply_guards_pathological_word(spark):
    """ADVICE r7: a word segmenting into >= 1000 subword tokens would
    collide the pos = word_pos*1000 + sym_pos encoding; the guard
    raises instead of silently misordering."""
    from bqetl_spark.functions.bpe import bpe_apply

    df = spark.createDataFrame([(1, "x" * 1200)], ["doc_id", "text"])
    with pytest.raises(Exception, match="1000 subword"):
        bpe_apply(df, merges=[]).collect()


def test_bpe_fertility_counts(spark):
    """r8: with no merges, fertility = (chars + 1 </w>) per word;
    with the 'lo' merge learned from 'low lower', 'low' segments to
    l o w </w> -> after lo-merge: lo w </w> = 3 symbols."""
    from bqetl_spark.functions.bpe import bpe_fertility

    df = spark.createDataFrame([(1, "low lower"), (2, "a")],
                               ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_words"], r["n_subwords"],
                         r["fertility_ppm"], r["max_word_subwords"])
           for r in bpe_fertility(df, merges=[]).collect()}
    # 'low' -> l o w </w> (4), 'lower' -> 6, 'a' -> a </w> (2)
    assert got[1] == (2, 10, 5_000_000, 6)
    assert got[2] == (1, 2, 2_000_000, 2)
    got2 = {r["doc_id"]: r["n_subwords"]
            for r in bpe_fertility(df, merges=[("l", "o")]).collect()}
    assert got2[1] == 8  # lo w </w> (3) + lo w e r </w> (5)
