"""doc_chunks / hash_sample / pack_sequences: edges + invariants + oracle."""

from __future__ import annotations

import pytest

from bqetl_spark.functions.chunking import doc_chunks, hash_sample, pack_sequences
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


# --- doc_chunks -----------------------------------------------------------

def test_chunks_cover_every_token_and_respect_size(spark):
    out = doc_chunks(_docs(spark), size=16, overlap=4).collect()
    assert out
    by_doc: dict[int, list] = {}
    for r in out:
        assert 1 <= r["n_tokens"] <= 16
        assert len(r["chunk_text"].split(" ")) == r["n_tokens"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {r["doc_id"]: r["text"] for r in _docs(spark).collect()}
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id].split()
        chunks.sort(key=lambda r: r["chunk_id"])
        # chunk ids contiguous from 0; starts advance by stride 12
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        covered = len(toks) == 0 or (len(chunks) - 1) * 12 < len(toks)
        assert covered  # last start <= n means every token is chunked
        # chunk i reproduces tokens[i*stride : i*stride+size] exactly
        for c in chunks:
            lo = c["chunk_id"] * 12
            assert c["chunk_text"] == " ".join(toks[lo:lo + 16])


def test_chunks_empty_doc_produces_no_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one two")], ["doc_id", "text"])
    rows = doc_chunks(df, size=4, overlap=1).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert rows[0]["chunk_text"] == "one two"


def test_chunks_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        doc_chunks(_docs(spark), size=8, overlap=8)


# --- hash_sample ----------------------------------------------------------

def test_hash_sample_deterministic_and_calibrated(spark):
    docs = _docs(spark)
    a = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.3).collect()}
    assert a == b  # reproducible: same sample on every run
    n = docs.count()
    assert 0.15 * n <= len(a) <= 0.45 * n  # calibrated around the rate
    # monotone: a lower-rate sample is a subset of a higher-rate one
    small = {r["doc_id"] for r in hash_sample(docs, 0.1).collect()}
    assert small <= a


def test_hash_sample_edges(spark):
    docs = _docs(spark)
    assert hash_sample(docs, 0.0).count() == 0
    assert hash_sample(docs, 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        hash_sample(docs, 1.5)


# --- pack_sequences -------------------------------------------------------

def test_packs_respect_budget_and_order(spark):
    budget = 256
    out = pack_sequences(_docs(spark), budget=budget).collect()
    packs: dict[tuple, int] = {}
    singletons: dict[tuple, int] = {}
    for r in out:
        key = (r["source"], r["pack_id"])
        packs[key] = packs.get(key, 0) + r["n_tokens"]
        singletons[key] = max(singletons.get(key, 0), r["n_tokens"])
    for key, total in packs.items():
        # a pack exceeds the budget only via its LAST doc straddling the
        # boundary (exclusive-cumsum rule) — never by more than one doc
        assert total < budget + singletons[key]
    # pack ids start at 0 and are contiguous per source
    by_src: dict[str, set] = {}
    for (src, pid), _ in packs.items():
        by_src.setdefault(src, set()).add(pid)
    for pids in by_src.values():
        assert pids == set(range(len(pids)))


def test_pack_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark), budget=0)


# --- oracle replicas (the driver-gate shapes at test SF) ------------------

def test_round4_ops_match_oracle(spark):
    import __spark_entry__ as em
    from tests.oracle_harness import compare, duck_connection

    con = duck_connection(SF_DIR)
    qs, osql = em.queries(), em.oracle_sql()
    for name in ("doc_chunks", "sample_hash", "pack_sequences"):
        r = compare(qs[name](spark, SF_DIR), con, osql[name])
        assert r["hash_match"], (name, r)


# --- stratified_hash_sample ----------------------------------------------

def test_stratified_rates_and_consistency(spark):
    docs = _docs(spark)
    from bqetl_spark.functions.chunking import stratified_hash_sample
    out = stratified_hash_sample(
        docs, rates={"en": 0.5, "de": 1.0, "fr": 0.0},
        strata_col="lang", default_rate=0.1)
    from pyspark.sql import functions as F
    by_lang_in = {r["lang"]: r["n"] for r in
                  docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    by_lang_out = {r["lang"]: r["n"] for r in
                   out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang_out.get("de") == by_lang_in.get("de")  # rate 1.0: all kept
    assert "fr" not in by_lang_out                        # rate 0.0: none
    if by_lang_in.get("en", 0) >= 20:
        assert 0.25 * by_lang_in["en"] <= by_lang_out.get("en", 0) \
            <= 0.75 * by_lang_in["en"]
    # same doc keeps/drops identically under hash_sample at the same rate
    from bqetl_spark.functions.chunking import hash_sample
    en_solo = {r["doc_id"] for r in
               hash_sample(docs.filter("lang = 'en'"), 0.5).collect()}
    en_strat = {r["doc_id"] for r in out.filter("lang = 'en'").collect()}
    assert en_solo == en_strat


def test_keep_best_picks_argmax_with_id_tiebreak(spark):
    from bqetl_spark.functions.dedup import keep_best

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], ["doc_id", "cluster_id"])
    scores = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.1), (8, 0.1)],
        ["doc_id", "quality_score"])
    out = {r["cluster_id"]: r["doc_id"]
           for r in keep_best(clusters, scores).collect()}
    assert out == {1: 2, 7: 7}  # 2 beats 3 on id-tie at 0.9; 7 ties low


def test_stratified_null_stratum_default_rate_one_keeps_all(spark):
    """default_rate=1.0 promises keeping every non-configured row — including
    NULL-stratum rows whose md5 bucket is the saturated all-f value (isin()
    evaluates to NULL for NULL, so the escape hatch needs explicit isNull)."""
    from bqetl_spark.functions.chunking import stratified_hash_sample

    # doc_id 44 has md5('44') starting with 'f' — with hex_digits=1 its
    # bucket equals the saturated cut, so only the escape hatch keeps it
    rows = [(44, None), (45, None), (46, "en")]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_hash_sample(df, rates={"en": 1.0}, strata_col="lang",
                                 default_rate=1.0, hex_digits=1)
    assert sorted(r["doc_id"] for r in out.collect()) == [44, 45, 46]


def test_quota_sample_exact_counts(spark):
    rows = [(i, "a" if i < 60 else ("b" if i < 80 else None))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    from bqetl_spark.functions.chunking import quota_sample
    out = quota_sample(df, {"a": 10, "b": 999}, strata_col="src").collect()
    by = {}
    for r in out:
        by.setdefault(r["src"], set()).add(r["doc_id"])
    assert len(by["a"]) == 10            # exact quota
    assert len(by["b"]) == 20            # quota > stratum keeps all
    assert set(by) == {"a", "b"}         # absent strata (None) dropped
    again = quota_sample(df, {"a": 10, "b": 999}, strata_col="src").collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
    # growing the quota EXTENDS the picked set (hash-rank prefix property)
    bigger = quota_sample(df, {"a": 20}, strata_col="src").collect()
    assert by["a"] <= {r["doc_id"] for r in bigger}


def test_mixture_repeats_weights(spark):
    rows = [(i, ["x", "y", "z", None][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    from bqetl_spark.functions.chunking import mixture_repeats
    out = mixture_repeats(df, {"x": 2.5, "y": 0.0}, strata_col="src").collect()
    per = {}
    for r in out:
        per.setdefault(r["src"], []).append(r["n_repeats"])
    assert set(per["x"]) <= {2, 3}       # base 2 + fractional third pass
    assert 0.2 < sum(1 for n in per["x"] if n == 3) / len(per["x"]) < 0.8
    assert set(per["y"]) == {0}          # zero weight drops on explode
    assert set(per["z"]) == {1} and set(per[None]) == {1}   # default 1.0
    import pytest
    with pytest.raises(ValueError, match=">= 0"):
        mixture_repeats(df, {"x": -1.0}, strata_col="src")


def test_export_shards_layout_balance_and_determinism(spark, tmp_path):
    from bqetl_spark.functions.chunking import export_shards, shard_assignment
    import glob
    import pytest as _pytest
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, f"t{i}") for i in range(2000)],
                               ["doc_id", "text"])
    out1 = str(tmp_path / "s1")
    back = export_shards(df, out1, n_shards=8)
    # layout: one shard=K directory per shard
    dirs = sorted(int(p.split("=")[1]) for p in glob.glob(f"{out1}/shard=*"))
    assert dirs == list(range(8))
    # total preservation + shard range
    assert back.count() == 2000
    sizes = {r["shard"]: r["n"] for r in
             back.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(8))
    # md5 uniformity: every shard within 2x of the mean (loose, exact
    # membership is pinned by the driver oracle)
    assert all(125 < n < 500 for n in sizes.values())
    # determinism: a second export yields identical membership
    out2 = str(tmp_path / "s2")
    again = export_shards(df, out2, n_shards=8)
    a = sorted((r["doc_id"], r["shard"]) for r in back.collect())
    b = sorted((r["doc_id"], r["shard"]) for r in again.collect())
    assert a == b
    with _pytest.raises(ValueError):
        shard_assignment("doc_id", 0)


def test_temperature_quotas_tail_upsampled(spark):
    """α=0.5 must upsample tail strata vs proportional: 90/9/1 corpus at
    budget 1000 → 703/222/74 (exact python replica of the fixed-point
    arithmetic), vs 900/90/10 proportional."""
    import math

    from bqetl_spark.functions.chunking import temperature_quotas

    df = spark.createDataFrame([("a",)] * 90 + [("b",)] * 9 + [("c",)] * 1,
                               "src string")
    got = {r["src"]: (r["n_docs"], r["quota"]) for r in
           temperature_quotas(df, "src", budget=1000, alpha=0.5).collect()}
    wq = {s: math.floor(math.sqrt(n / 100) * 1e12)
          for s, n in (("a", 90), ("b", 9), ("c", 1))}
    ws = sum(wq.values())
    want = {s: ((90, 9, 1)[i], 1000 * wq[s] // ws)
            for i, s in enumerate("abc")}
    assert got == want
    assert sum(q for _, q in got.values()) <= 1000
    # alpha=1 is proportional
    got1 = {r["src"]: r["quota"] for r in
            temperature_quotas(df, "src", budget=1000, alpha=1.0).collect()}
    assert got1 == {"a": 900, "b": 90, "c": 10}


def test_temperature_sample_membership_deterministic(spark):
    """The picked set per stratum is the quota-many smallest md5(id) —
    stable across runs and partitionings; NULL strata are kept."""
    import hashlib

    from bqetl_spark.functions.chunking import temperature_sample

    rows = [(i, "a") for i in range(90)] + \
           [(i, "b") for i in range(100, 109)] + [(200, None)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    got = {(r["doc_id"], r["src"]) for r in
           temperature_sample(df, "src", budget=50, alpha=0.5,
                              id_col="doc_id").collect()}
    again = {(r["doc_id"], r["src"]) for r in
             temperature_sample(df.repartition(7), "src", budget=50,
                                alpha=0.5, id_col="doc_id").collect()}
    assert got == again and len(got) > 0
    assert any(s is None for _, s in got)   # NULL stratum sampled too
    # per-stratum membership == smallest md5 ranks
    from bqetl_spark.functions.chunking import temperature_quotas
    quotas = {r["src"]: r["quota"] for r in
              temperature_quotas(df, "src", budget=50, alpha=0.5).collect()}
    for s, ids in (("a", range(90)), ("b", range(100, 109))):
        ranked = sorted(ids, key=lambda i: (hashlib.md5(
            str(i).encode()).hexdigest(), i))
        want = {(i, s) for i in ranked[:quotas[s]]}
        assert {x for x in got if x[1] == s} == want


def test_temperature_quotas_validation(spark):
    from bqetl_spark.functions.chunking import temperature_quotas

    df = spark.createDataFrame([("a",)], "src string")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        temperature_quotas(df, "src", budget=-1)
    with _pytest.raises(ValueError):
        temperature_quotas(df, "src", budget=10, alpha=-0.5)
