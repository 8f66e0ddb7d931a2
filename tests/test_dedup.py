from bqetl_spark.functions import dedup as dd


def _docs(spark):
    base = "spark makes big data processing simple fast and reliable for everyone today"
    near = "spark makes big data processing simple fast and reliable for most people today"
    rows = [
        (1, base),
        (2, base),                      # exact dup of 1
        (3, near),                      # near dup of 1
        (4, "completely different content about cooking pasta with tomato sauce basil"),
        (5, "Spark Makes Big Data Processing Simple Fast And Reliable For Everyone Today"),  # case-variant of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact(spark):
    out = dd.dedup_exact(_docs(spark)).collect()
    survivors = {r["doc_id"]: r["n_copies"] for r in out}
    assert survivors[1] == 2            # rows 1+2 collapse
    assert 2 not in survivors
    assert survivors[4] == 1 and survivors[5] == 1


def test_dedup_fingerprint_case_insensitive(spark):
    out = dd.dedup_fingerprint(_docs(spark)).collect()
    survivors = {r["doc_id"]: r["n_copies"] for r in out}
    assert survivors[1] == 3            # 1, 2 and the case-variant 5
    assert 5 not in survivors


def test_minhash_lsh_finds_near_dup(spark):
    pairs = dd.minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got                # exact dup always collides
    assert (1, 3) in got or (2, 3) in got  # near dup lands in a shared band
    assert all(4 not in p for p in got)    # unrelated doc never pairs


def test_minhash_jaccard_value_sane(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dd.minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.0).collect()}
    assert pairs[(1, 2)] == 1.0


def test_ngram_jaccard_pairs(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dd.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] < 1.0
    assert all(4 not in (a, b) for a, b in pairs)


def test_simhash_near_dup(spark):
    # short toy docs flip many bits per word change → use a loose budget and
    # a tiny prefix block; production corpora use (3, 16)
    pairs = dd.simhash_pairs(_docs(spark), max_hamming=24, prefix_bits=2).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0         # identical text → identical simhash
    assert (1, 3) in got                # near dup within hamming budget
    assert got[(1, 3)] > 0
    assert (1, 4) not in got or got[(1, 3)] < got.get((1, 4), 64)


def test_connected_components_chain_and_clique(spark):
    # components: {1,2,3,4} (a chain — needs label propagation across hops),
    # {10,11,12} (a triangle), {20,21} (one edge). 99 never appears.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["src", "dst"])
    got = {r["node"]: r["comp"]
           for r in dd.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_representatives(spark):
    out = dd.dedup_clusters(_docs(spark), jaccard_threshold=0.3).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # docs 1/2 are exact dups (jaccard 1.0): same cluster, min-id rep
    assert by_doc[1]["cluster_id"] == by_doc[2]["cluster_id"] == 1
    assert by_doc[1]["is_representative"] and not by_doc[2]["is_representative"]
    assert by_doc[1]["cluster_size"] == len(
        [r for r in out if r["cluster_id"] == by_doc[1]["cluster_id"]])
    # the unrelated doc is not clustered at all
    assert 4 not in by_doc
    # exactly one representative per cluster
    clusters = {r["cluster_id"] for r in out}
    reps = [r for r in out if r["is_representative"]]
    assert len(reps) == len(clusters)


def test_connected_components_long_chain_converges(spark):
    # a 60-node path has diameter 59: plain min-propagation would need 59
    # rounds; pointer jumping must land it well inside max_iter=30.
    # driver_edges_max=0 forces the DISTRIBUTED loop (the r12 union-find
    # fast path would otherwise absorb a graph this small).
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)], ["src", "dst"])
    got = {r["node"]: r["comp"]
           for r in dd.connected_components(edges, max_iter=30,
                                            driver_edges_max=0).collect()}
    assert set(got.values()) == {1} and len(got) == 60


def test_connected_components_driver_path_equals_distributed(spark):
    # the r12 size-adaptive union-find fast path must produce the exact
    # labeling of the distributed propagation loop — same (node, comp)
    # set on a graph mixing chains, cliques, stars and singleton edges,
    # with non-contiguous ids and both edge orientations
    import random

    rng = random.Random(12012)
    edges = []
    base = 0
    for _ in range(40):
        kind = rng.choice(["chain", "clique", "star", "edge"])
        n = rng.randint(2, 9)
        ids = [base + i * 7 for i in range(n)]
        rng.shuffle(ids)
        base += n * 7 + 3
        if kind == "chain":
            edges += list(zip(ids, ids[1:]))
        elif kind == "clique":
            edges += [(a, b) for i, a in enumerate(ids)
                      for b in ids[i + 1:]]
        elif kind == "star":
            edges += [(ids[0], x) for x in ids[1:]]
        else:
            edges.append((ids[0], ids[1]))
    rng.shuffle(edges)
    # random orientation per edge
    edges = [(b, a) if rng.random() < 0.5 else (a, b) for a, b in edges]
    df = spark.createDataFrame(edges, ["src", "dst"])
    fast = {(r["node"], r["comp"])
            for r in dd.connected_components(df).collect()}
    dist = {(r["node"], r["comp"])
            for r in dd.connected_components(
                df, driver_edges_max=0).collect()}
    assert fast == dist and len(fast) > 0


def test_minhash_bucket_cap_subsets_exact(spark):
    from bqetl_spark.functions.dedup import minhash_lsh_pairs
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs).collect()}
    hi = {(r["id_a"], r["id_b"])
          for r in minhash_lsh_pairs(docs, max_bucket_size=10**6).collect()}
    assert hi == exact  # huge cap is a no-op
    lo = {(r["id_a"], r["id_b"])
          for r in minhash_lsh_pairs(docs, max_bucket_size=2).collect()}
    assert lo <= exact  # the guard only ever removes pairs


def test_dedup_against_drops_seen_and_batch_dupes(spark):
    rows = [(1, "alpha beta gamma"), (3, "ALPHA beta gamma!"),  # dup of seen 2
            (5, "new one here"), (7, "new one here"),           # batch dup pair
            (9, "unique text nine")]
    seen_rows = [(2, "alpha beta gamma"), (4, "other seen text")]
    new = spark.createDataFrame(rows, ["doc_id", "text"])
    seen = spark.createDataFrame(seen_rows, ["doc_id", "text"])
    from bqetl_spark.functions.dedup import dedup_against
    kept = sorted(r["doc_id"] for r in dedup_against(new, seen).collect())
    # 1 and 3 collide with seen doc 2 (normalized); 5 beats 7; 9 unique
    assert kept == [5, 9]


def test_minhash_pairs_between_finds_cross_dups_only(spark):
    from bqetl_spark.functions.dedup import minhash_pairs_between
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    new = docs.filter("doc_id % 2 = 1")
    seen = docs.filter("doc_id % 2 = 0")
    pairs = minhash_pairs_between(new, seen).collect()
    assert pairs  # the corpus has cross-parity near-dups by construction
    for r in pairs:
        assert r["new_id"] % 2 == 1 and r["seen_id"] % 2 == 0
        assert r["jaccard"] >= 0.5


def _marker_corpus(spark, n_docs=40, seed=7):
    """Corpus with true near-dup pairs (j >= 0.9) AND adversarial moderate-
    overlap siblings (marker token every 5th word, j ~ 0.33 — the gen_scale
    cross-copy shape that band-collides ~97% of the time with 2-row bands)."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for d in range(n_docs):
        toks = [rng.choice(vocab) for _ in range(60)]
        rows.append((d * 10, " ".join(toks)))
        # true near-dup: one token changed out of 60 (3-gram j ~ 0.95)
        dup = list(toks)
        dup[30] = "CHANGED"
        rows.append((d * 10 + 1, " ".join(dup)))
        # adversarial sibling: marker after every 5th token (j ~ 0.33)
        sib = []
        for i, t in enumerate(toks):
            sib.append(t)
            if (i + 1) % 5 == 0:
                sib.append(f"zq{d}")
        rows.append((d * 10 + 2, " ".join(sib)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_prefilter_preserves_output(spark):
    """The signature-estimate pre-filter must be invisible in the result:
    same pairs, same jaccard values, with the adversarial sibling load."""
    docs = _marker_corpus(spark)
    kw = dict(num_perm=64, bands=32, jaccard_threshold=0.9)
    off = sorted(tuple(r) for r in
                 dd.minhash_lsh_pairs(docs, est_margin=1.0, **kw).collect())
    on = sorted(tuple(r) for r in dd.minhash_lsh_pairs(docs, **kw).collect())
    assert on == off
    assert len(on) >= 40  # every (d*10, d*10+1) true pair must be present


def test_minhash_prefilter_never_drops_true_pairs(spark):
    """Property: a pair with exact shingle jaccard >= threshold survives the
    pre-filter (margin is 4 sigma + 2/num_perm below threshold, so the
    false-drop probability per true pair is ~1e-6; 120 seeded pairs here).
    Exact jaccard is recomputed in Python to certify each pair qualifies."""
    import random

    rng = random.Random(123)
    vocab = [f"t{i}" for i in range(2000)]

    def grams(toks, n=3):
        return {" ".join(toks[i:i + n]) for i in range(max(len(toks) - n + 1, 1))}

    rows, true_pairs = [], []
    for d in range(120):
        toks = [rng.choice(vocab) for _ in range(rng.randint(40, 120))]
        edit = list(toks)
        edit[rng.randrange(len(edit))] = "X"  # single-token edit
        ga, gb = grams(toks), grams(edit)
        j = len(ga & gb) / len(ga | gb)
        if j >= 0.9:
            true_pairs.append((d * 2, d * 2 + 1))
            rows += [(d * 2, " ".join(toks)), (d * 2 + 1, " ".join(edit))]
    assert len(true_pairs) >= 90
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]) for r in dd.minhash_lsh_pairs(
        docs, num_perm=64, bands=32, jaccard_threshold=0.9).collect()}
    missed = [p for p in true_pairs if p not in got]
    assert not missed, f"pre-filter dropped true pairs: {missed}"


def test_contamination_flags_exact(spark):
    """Known-overlap fixture: corpus doc 1 embeds benchmark doc 100's
    8-gram run; doc 2 is clean; doc 3 shares with TWO benchmark docs."""
    from bqetl_spark.functions.dedup import contamination_flags

    run_a = " ".join(f"w{i}" for i in range(8))          # 8 tokens
    run_b = " ".join(f"x{i}" for i in range(8))
    bench = spark.createDataFrame(
        [(100, run_a + " tail tokens here"), (200, run_b)],
        ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "prefix " + run_a + " suffix"),
         (2, "totally different words only nothing shared at all ok"),
         (3, run_a + " and " + run_b)],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_shared_grams"], r["n_benchmark_docs"])
           for r in contamination_flags(corpus, bench, n=8).collect()}
    assert set(got) == {1, 3}                            # doc 2 clean
    assert got[1][1] == 1 and got[1][0] >= 1
    assert got[3][1] == 2                                # both benchmarks
    # boilerplate guard: grams in >1 benchmark docs droppable
    guarded = contamination_flags(corpus, bench, n=8, max_gram_freq=0)
    assert guarded.count() == 0


# --- exact substring duplication (r7) ----------------------------------


def test_substring_dup_exact_pairs(spark):
    """Docs sharing a long verbatim span are caught at ANY alignment
    (content-defined selection); docs with no shared window are not."""
    from bqetl_spark.functions.dedup import substring_dup_pairs

    span = "the quick brown fox jumps over the lazy dog " * 4  # 176 chars
    docs = spark.createDataFrame(
        [(1, "A" * 7 + span + "tail one"),      # span at offset 8
         (2, "BB" + span + "different tail"),   # same span, offset 3
         (3, "unrelated text " * 20),
         (4, "unrelated text " * 20)],          # 3,4 identical -> pair
        "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in substring_dup_pairs(
               docs, window=64, stride=8, max_window_freq=None).collect()}
    assert (1, 2) in out and (3, 4) in out
    assert (1, 3) not in out and (2, 4) not in out


def test_substring_dup_alignment_independence(spark):
    """Content-defined selection: a window is indexed iff its digest
    selects it, independent of where it sits in the document — so the
    same long span pairs up every offset with every other (a positional
    stride would only match offsets equal mod stride, the misalignment
    failure this design avoids)."""
    from bqetl_spark.functions.dedup import substring_dup_pairs

    window, stride = 32, 8
    # 160-char span: miss probability (7/8)^(160-32+1) ~ 3e-8, and md5 is
    # deterministic, so this test cannot flake
    span = "".join(chr(97 + (i * 7) % 26) for i in range(160))
    rows = [(100 + off, "p" * off + span + "q" * 30) for off in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"])
           for r in substring_dup_pairs(
               docs, window=window, stride=stride,
               max_window_freq=None).collect()}
    # all 9 offsets must pair with each other: C(9,2) = 36 pairs
    assert len(got) == 36


def test_substring_dup_freq_guard(spark):
    """A window present in > max_window_freq docs is boilerplate: it must
    not generate pairs (and the guard counts DOCUMENTS, not repeats
    within one document)."""
    from bqetl_spark.functions.dedup import substring_dup_pairs

    boiler = "LICENSE HEADER " * 8                # 120 chars, shared by all
    docs = spark.createDataFrame(
        [(i, boiler + f"unique body {i} " * 10) for i in range(5)],
        "doc_id long, text string")
    guarded = substring_dup_pairs(docs, window=64, stride=8,
                                  max_window_freq=3).collect()
    unguarded = substring_dup_pairs(docs, window=64, stride=8,
                                    max_window_freq=None).collect()
    assert len(unguarded) == 10                   # C(5,2) via the header
    assert len(guarded) == 0                      # header freq 5 > 3


def test_ngram_prefix_equals_inverted_index(spark):
    """r7 PPJoin-style prefix filter: the prefix principle loses no pair,
    so the output must equal ngram_jaccard_pairs exactly."""
    from bqetl_spark.functions.dedup import (ngram_jaccard_pairs,
                                             ngram_jaccard_prefix_pairs)

    rows = [(i, f"alpha beta gamma delta {i % 4} epsilon zeta eta theta")
            for i in range(12)] + [(100, "totally different words here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    pref = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_prefix_pairs(
                docs, threshold=0.5).collect()}
    assert exact == pref and len(exact) > 0


# -------------------------------------------- boilerplate strip (r7) --

def test_boilerplate_segments_dropped_and_rebuilt(spark):
    """A verbatim 3-token header shared by >= min_docs docs must be
    stripped; rebuilt text (clean_hash) must equal the md5 of the
    surviving segments joined in order."""
    import hashlib

    from bqetl_spark.functions.dedup import strip_boilerplate_segments

    header = "subscribe to newsletter"
    rows = [(i, f"{header} body{i} text{i} tail{i}") for i in range(5)]
    rows.append((99, "totally unique document body here"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           strip_boilerplate_segments(df, seg_len=3, min_docs=5).collect()}
    for i in range(5):
        r = out[i]
        assert (r["n_segs"], r["kept_segs"], r["dropped_segs"]) == (2, 1, 1)
        clean = f"body{i} text{i} tail{i}"
        assert r["clean_hash"] == hashlib.md5(clean.encode()).hexdigest()
    r99 = out[99]
    assert r99["dropped_segs"] == 0 and r99["kept_segs"] == r99["n_segs"]


def test_boilerplate_full_strip_yields_empty_md5(spark):
    import hashlib

    from bqetl_spark.functions.dedup import strip_boilerplate_segments

    df = spark.createDataFrame(
        [(i, "the same exact text") for i in range(6)],
        ["doc_id", "text"])
    rows = strip_boilerplate_segments(df, seg_len=4, min_docs=5).collect()
    empty = hashlib.md5(b"").hexdigest()
    assert all(r["kept_segs"] == 0 and r["clean_hash"] == empty
               for r in rows)


def test_boilerplate_below_threshold_untouched(spark):
    from bqetl_spark.functions.dedup import strip_boilerplate_segments

    df = spark.createDataFrame(
        [(1, "shared head one"), (2, "shared head two"),
         (3, "another doc three")], ["doc_id", "text"])
    rows = strip_boilerplate_segments(df, seg_len=3, min_docs=5).collect()
    assert all(r["dropped_segs"] == 0 for r in rows)


def test_boilerplate_validation(spark):
    import pytest as _pt

    from bqetl_spark.functions.dedup import strip_boilerplate_segments

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pt.raises(ValueError):
        strip_boilerplate_segments(df, seg_len=0)
    with _pt.raises(ValueError):
        strip_boilerplate_segments(df, min_docs=1)


# --------------------------------------- edit-distance pairs (r7) --

def test_edit_distance_pairs_exact_distances(spark):
    """Docs sharing the block prefix pair up with the true Levenshtein
    distance; pairs beyond max_dist are excluded; ids are canonical
    (id_a < id_b, no self-pairs)."""
    from bqetl_spark.functions.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "common head alpha one"),
         (2, "common head alpha two"),     # dist 3 vs doc 1 (one->two)
         (3, "common head alpha onX"),     # dist 1 vs doc 1
         (4, "totally different prefix")],  # own block, never paired
        ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r["dist"]
           for r in edit_distance_pairs(
               df, prefix_len=48, block_chars=12, max_dist=4).collect()}
    assert out[(1, 3)] == 1
    assert out[(1, 2)] == 3
    assert out[(2, 3)] == 3
    assert all(a < b for a, b in out)
    assert not any(a == 4 or b == 4 for a, b in out)


def test_edit_distance_pairs_max_dist_cutoff(spark):
    from bqetl_spark.functions.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "same twelve c AAAAAAAAAA"),
         (2, "same twelve c ZZZZZZZZZZ")],  # 10 substitutions
        ["doc_id", "text"])
    near = edit_distance_pairs(df, block_chars=12, max_dist=10).collect()
    assert len(near) == 1 and near[0]["dist"] == 10
    far = edit_distance_pairs(df, block_chars=12, max_dist=9).collect()
    assert far == []


def test_edit_distance_pairs_block_guard_drops_megablock(spark):
    """A block larger than max_block_size is dropped entirely — the
    deterministic boilerplate guard; smaller blocks still pair."""
    from bqetl_spark.functions.dedup import edit_distance_pairs

    rows = [(i, f"megablock hdr variant {i}") for i in range(10)]
    rows += [(100, "small block A x"), (101, "small block A y")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = edit_distance_pairs(df, block_chars=12, max_dist=24,
                              max_block_size=5).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(100, 101)}


def test_edit_distance_pairs_non_ascii_excluded(spark):
    """Rows whose prefix contains non-printable-ASCII go to the MinHash
    tier instead — they must not appear in any pair."""
    from bqetl_spark.functions.dedup import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "ascii prefix block one"),
         (2, "ascii prefix block two"),
         (3, "ascii prefix blöck close")],  # ö breaks the ASCII gate
        ["doc_id", "text"])
    out = edit_distance_pairs(df, block_chars=12, max_dist=24).collect()
    ids = {r["id_a"] for r in out} | {r["id_b"] for r in out}
    assert 3 not in ids and (1, 2) in {(r["id_a"], r["id_b"]) for r in out}


def test_ngram_containment_asymmetric(spark):
    """r8: a short doc pasted inside a long one scores containment 1.0
    from the short side only; Jaccard would miss it. Validation paths
    covered."""
    import pytest

    short = "alpha beta gamma delta epsilon"
    long_ = ("intro words here first " + short +
             " and then a very long tail of unrelated filler text "
             "continues onward with many more words than the source")
    df = spark.createDataFrame([(1, short), (2, long_), (3, "nothing alike here at all")],
                               ["doc_id", "text"])
    out = {(r["src_id"], r["dst_id"]): (r["n_src_grams"], r["containment"])
           for r in dd.ngram_containment_pairs(df, n=3,
                                               threshold=0.8).collect()}
    assert (1, 2) in out and out[(1, 2)][1] == 1.0
    assert (2, 1) not in out          # long side is NOT contained
    assert not any(3 in k for k in out)
    with pytest.raises(ValueError):
        dd.ngram_containment_pairs(df, threshold=0.0)
    with pytest.raises(ValueError):
        dd.ngram_containment_pairs(df, min_grams=0)


def test_ngram_containment_both_directions_on_twins(spark):
    """Identical docs contain each other — both ordered pairs emitted."""
    t = "one two three four five six seven eight nine"
    df = spark.createDataFrame([(1, t), (2, t)], ["doc_id", "text"])
    got = sorted((r["src_id"], r["dst_id"], r["containment"])
                 for r in dd.ngram_containment_pairs(
                     df, n=3, threshold=0.8).collect())
    assert got == [(1, 2, 1.0), (2, 1, 1.0)]


def test_minhash_near_threshold_miss_budget(spark):
    """ADVICE r11 audit: the 16x4 band geometry puts the per-pair LSH
    miss probability at (1-j^4)^16 — ~4e-8 at j=0.90, falling fast
    with j (~2e-12 by j=0.95). A single missed pair reds the exact-
    jaccard oracle of 4 gates, and the AGGREGATE miss budget scales
    with the count of near-threshold pairs, so that count must be
    MEASURED per scale point, not assumed small. Counts the verified
    gate-output pairs with jaccard in [0.90, 0.95) on every gate
    corpus (miss prob is ~4e-8, so observed count ~= true count) and
    asserts the worst-case aggregate budget stays below 1e-3."""
    import glob

    from pyspark.sql import functions as F

    budget = 0.0
    counts = {}
    for sf_dir in ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                   "/root/testdata/sf0.1"]:
        if not glob.glob(f"{sf_dir}/documents.parquet"):
            continue
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = dd.minhash_lsh_pairs(docs, num_perm=64, bands=16,
                                     jaccard_threshold=0.9)
        n = (pairs.filter((F.col("jaccard") >= 0.90)
                          & (F.col("jaccard") < 0.95)).count())
        counts[sf_dir] = n
        budget += n * (1.0 - 0.9 ** 4) ** 16    # worst case of the band
    print(f"near-threshold pair counts: {counts}, "
          f"aggregate miss budget {budget:.3e}")
    assert budget < 1e-3, (
        f"aggregate LSH miss budget {budget:.3e} over {counts} — "
        "near-threshold pair mass has grown enough that the 16x4 "
        "geometry's per-pair 4e-8 no longer rounds to exact; widen "
        "the bands or document the budget")


def test_connected_components_null_endpoints_agree(spark):
    # r13 (advisor): a null endpoint used to CRASH the union-find fast
    # path (min/max on None) while the distributed loop silently
    # propagated through it. Both paths now drop null-endpoint edges up
    # front and must agree: nulls never join anything, real components
    # are unaffected.
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("src", T.LongType()),
                           T.StructField("dst", T.LongType())])
    rows = [(1, 2), (2, 3), (None, 4), (5, None), (None, None), (7, 8)]
    df = spark.createDataFrame(rows, schema)
    fast = {(r["node"], r["comp"])
            for r in dd.connected_components(df).collect()}
    dist = {(r["node"], r["comp"])
            for r in dd.connected_components(
                df, driver_edges_max=0).collect()}
    assert fast == dist
    assert fast == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
