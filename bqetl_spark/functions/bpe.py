"""Distributed BPE (byte-pair-encoding) merge-table training.

Beyond-reference, training-pipeline surface: learning a subword
vocabulary from the corpus is the canonical pre-training step the
engine's token statistics (functions/text.py) feed into. The algorithm
is Sennrich et al.'s word-frequency formulation — which is exactly what
makes it Spark-shaped: the corpus collapses to a (word, freq) table in
ONE shuffle, and every merge iteration then runs on that compact vocab
table, never rescanning the documents.

Cross-engine determinism (the whole design): symbol sequences are
encoded as strings — each symbol wrapped in single spaces, adjacent
symbols separated by TWO spaces (' l  o  w  </w> ') — so the merge step
is a plain ``replace(s, ' l  r ', ' lr ')`` whose left-to-right
non-overlapping scan is identical in Spark (Java String.replace) and
DuckDB, including the greedy 'aaa' -> ['aa','a'] case. Pair counts are
integer sums; the argmax pair breaks ties (count DESC, left ASC, right
ASC); so the full merge table is value-hash-oracle-able with the
iterations unrolled as SQL CTEs (same treatment as pagerank / the
k-means oracle unrolls).

Scale posture: the documents scan happens once (tokenize + count — the
standard word-count shuffle). Each of the ``n_merges`` iterations is one
aggregation over the vocab table (|distinct words| rows — millions at
100 TB, not the corpus size) plus a 1-ROW collect (the argmax pair —
metadata-bounded, same class as the IVF centroid collects) and a
map-only replace. Lineage is cut per iteration (caching.pin) so the plan
stays O(1) deep. A vocab too large for comfort is truncated by
``min_freq`` / ``max_vocab`` — the standard practice knobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bqetl_spark.caching import pin
from bqetl_spark.functions.text import tokens

MERGE_SCHEMA = T.StructType([
    T.StructField("rank", T.LongType(), False),
    T.StructField("left", T.StringType(), False),
    T.StructField("right", T.StringType(), False),
    T.StructField("merged", T.StringType(), False),
    T.StructField("pair_count", T.LongType(), False),
])


def word_freq_table(docs: DataFrame, text_col: str = "text",
                    min_freq: int = 1,
                    max_vocab: int | None = None) -> DataFrame:
    """(word, freq BIGINT) over whitespace tokens — the corpus collapse
    every BPE iteration runs on. ``max_vocab`` keeps the most frequent
    words (ties by word ASC) when the distinct-word table itself needs
    bounding."""
    wf = (docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
          .filter(F.col("word") != "")
          .groupBy("word").agg(F.count("*").cast("long").alias("freq"))
          .filter(F.col("freq") >= min_freq))
    if max_vocab is not None:
        wf = (wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_vocab))
    return wf


def _encode(word_col: str = "word") -> F.Column:
    """word -> ' c  h  a  r  s  </w> ' (single-space-wrapped symbols,
    double-space separated) — the representation whose pair merge is a
    plain string replace with identical semantics in both engines."""
    return F.expr(
        f"concat(' ', array_join(concat(transform(sequence(1, "
        f"char_length({word_col})), i -> substring({word_col}, i, 1)), "
        f"array('</w>')), '  '), ' ')")


def bpe_train(docs: DataFrame, n_merges: int = 8, text_col: str = "text",
              min_freq: int = 1, max_vocab: int | None = None) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus.

    Returns the merge table (rank BIGINT starting at 1, left, right,
    merged, pair_count BIGINT) in learned order — the artifact a
    tokenizer consumes. Words carry the classic '</w>' end-of-word
    symbol. Stops early if the vocab runs out of adjacent pairs.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = docs.sparkSession
    vocab = pin(word_freq_table(docs, text_col, min_freq, max_vocab)
                .select("word", "freq", _encode("word").alias("s")))
    merges: list[tuple] = []
    for k in range(1, n_merges + 1):
        sym = F.split(F.trim(F.col("s")), "  ")
        pairs = (vocab
                 .select("freq", sym.alias("sym"))
                 .filter(F.size("sym") >= 2)
                 .select("freq", F.explode(F.expr(
                     "transform(sequence(1, size(sym) - 1), i -> "
                     "struct(element_at(sym, i) AS l, "
                     "element_at(sym, i + 1) AS r))")).alias("p"))
                 .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                 .agg(F.sum("freq").cast("long").alias("cnt")))
        # 1-row collect: the argmax pair is metadata, not data (same
        # bounded-collect class as the IVF centroid fetches)
        best = (pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1).collect())
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((k, l, r, l + r, cnt))
        vocab = vocab.select(
            "word", "freq",
            F.replace(F.col("s"), F.lit(f" {l}  {r} "),
                      F.lit(f" {l}{r} ")).alias("s"))
        if k < n_merges:
            vocab = pin(vocab)  # cut lineage: O(1) plan depth per round
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_apply(docs: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list to the corpus: (id_col, token STRING,
    pos BIGINT) — one row per subword token per word occurrence order.
    Map-only (the merge list is a plan literal, applied as chained
    replaces per word); the segmentation step a training-data pipeline
    runs after :func:`bpe_train`.

    ``merges`` is [(left, right), ...] in rank order (e.g. zip of the
    trained table's left/right columns).
    """
    word = (docs.select(F.col(id_col),
                        F.posexplode(tokens(F.col(text_col)))
                        .alias("word_pos", "word"))
            .filter(F.col("word") != ""))
    s = _encode("word")
    for l, r in merges:
        s = F.replace(s, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    return (word.select(id_col, "word_pos",
                        F.posexplode(F.split(F.trim(s), "  "))
                        .alias("sym_pos", "token"))
            .select(id_col, "token",
                    (F.col("word_pos") * 1000 + F.col("sym_pos"))
                    .cast("long").alias("pos")))
