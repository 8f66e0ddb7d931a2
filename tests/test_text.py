from pyspark.sql import functions as F

from bqetl_spark.functions import text as tx


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "der hund ist ein guter freund und das ist schön", "de"),
        (3, "le chat est sur la table et il ne bouge pas", "fr"),
        (4, "", "und"),
        (5, "zzzzz!!! ??? ###", "und"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "expect_lang"])


def test_token_count(spark):
    df = _docs(spark).withColumn("n", tx.token_count("text"))
    got = {r["doc_id"]: r["n"] for r in df.collect()}
    assert got[1] == 9
    assert got[4] == 0


def test_bpe_ish_token_count_monotone(spark):
    df = _docs(spark).withColumn("n", tx.bpe_ish_token_count("text"))
    got = {r["doc_id"]: r["n"] for r in df.collect()}
    assert got[1] >= 9          # subword count ≥ word count
    assert got[5] > 0           # punctuation counts


def test_lang_id(spark):
    out = tx.lang_id(_docs(spark))
    got = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[5] == "und"      # zero stopword evidence


def test_quality_score_flags_junk(spark):
    out = tx.quality_score(_docs(spark))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["keep"] is True
    assert got[5]["keep"] is False  # too few tokens + pure punctuation


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "different text")],
        ["doc_id", "text"])
    out = df.select("doc_id", tx.fingerprint("text").alias("fp")).collect()
    fps = {r["doc_id"]: r["fp"] for r in out}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co or https://x.io/p?q=1 or +1 555-0199 end"),
         (2, "no pii here")], ["id", "t"])
    got = {r["id"]: (r["clean"], r["n"])
           for r in df.select("id", tx.redact_pii("t").alias("clean"),
                              tx.pii_count("t").alias("n")).collect()}
    assert got[1] == ("mail <EMAIL> or <URL> or <PHONE> end", 3)
    assert got[2] == ("no pii here", 0)


def test_gram_repetition_degenerate_doc(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),      # 'spam spam' x3 of 3 bigrams
         (2, "a b c d"),                  # all bigrams unique
         (3, "one")], ["doc_id", "text"]) # too short: excluded
    got = {r["doc_id"]: r for r in tx.gram_repetition(df).collect()}
    assert got[1]["rep_ratio"] == 1.0 and got[1]["n_grams"] == 3
    assert got[2]["rep_ratio"] == 1.0 / 3
    assert 3 not in got
