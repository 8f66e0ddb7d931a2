"""vocab_growth (r10): Heaps-law curve — exact totals, monotone
cumulatives, and the first-appearance bucketing rule on a hand-built
corpus where the curve is known."""

from __future__ import annotations

from pyspark.sql import functions as F

from bqetl_spark.functions.text import vocab_growth


def test_known_curve(spark):
    # ids 0..9, buckets=10 -> one doc per bucket; 'base' appears in
    # every doc (type counted once, in bucket 1); each doc i adds one
    # new word w{i}
    docs = spark.createDataFrame(
        [(i, f"base w{i}") for i in range(10)], ["doc_id", "text"])
    rows = {r["bucket"]: r for r in vocab_growth(docs).collect()}
    assert set(rows) == set(range(1, 11))
    for b in range(1, 11):
        assert rows[b]["n_docs"] == b
        assert rows[b]["n_tokens"] == 2 * b
        assert rows[b]["n_types"] == b + 1   # 'base' + b new words
    # monotone by construction
    assert all(rows[b]["n_types"] <= rows[b + 1]["n_types"]
               for b in range(1, 10))


def test_totals_reconcile_with_corpus(spark, docs_df):
    rows = sorted(vocab_growth(docs_df).collect(),
                  key=lambda r: r["bucket"])
    last = rows[-1]
    assert last["n_docs"] == docs_df.count()
    toks = (docs_df.select(F.explode(F.split(F.trim("text"), r"\s+"))
                           .alias("w"))
            .filter(F.col("w") != ""))
    assert last["n_tokens"] == toks.count()
    assert last["n_types"] == toks.distinct().count()
    # cumulative counters never decrease
    for a, b in zip(rows, rows[1:]):
        for c in ("n_docs", "n_tokens", "n_types"):
            assert a[c] <= b[c]
