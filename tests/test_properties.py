"""Property-based tests (hypothesis) for the reshaping core.

The reference's tests are golden-value only (SURVEY.md §5); these check the
operator invariants on arbitrary inputs. Example counts are kept small —
each example is a Spark job.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from bqetl_spark.operators.nest import nest, split_repeated


@settings(max_examples=10, deadline=None)
@given(n_children=st.integers(0, 57), limit=st.integers(1, 20))
def test_split_repeated_partitions_exactly(spark, n_children, limit):
    parent = spark.createDataFrame([(1, list(range(n_children)))],
                                   "k int, arr array<int>")
    out = split_repeated(parent, "arr", limit=limit).collect()
    chunks = [r["arr"] for r in out]
    # invariant 1: concatenation reproduces the original list in order
    assert [x for c in chunks for x in c] == list(range(n_children))
    # invariant 2: every chunk ≤ limit; all but the last exactly == limit
    assert all(len(c) <= limit for c in chunks)
    assert all(len(c) == limit for c in chunks[:-1])
    # invariant 3: empty array still yields one (empty) row
    assert len(chunks) >= 1


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100)),
                min_size=0, max_size=40))
def test_nest_preserves_children_exactly(spark, pairs):
    parents = spark.createDataFrame([(k,) for k in range(6)], "k int")
    if pairs:
        children = spark.createDataFrame(pairs, "ck int, v int")
    else:
        children = spark.createDataFrame([], "ck int, v int")
    out = nest(parents, children, "k", "ck", "vs", child_cols=["v"],
               sort_children_by="v")
    got = {r["k"]: sorted(c["v"] for c in r["vs"]) for r in out.collect()}
    # every parent present; children partitioned by key, none lost or invented
    assert set(got) == set(range(6))
    for k in range(6):
        expect = sorted(v for ck, v in pairs if ck == k)
        assert got[k] == expect


_WORD = st.text(alphabet="abcdef", min_size=1, max_size=4)


@settings(max_examples=8, deadline=None)
@given(words=st.lists(_WORD, min_size=0, max_size=60),
       size=st.integers(2, 12), overlap=st.integers(0, 6))
def test_doc_chunks_cover_and_reconstruct(spark, words, size, overlap):
    from bqetl_spark.functions.chunking import doc_chunks

    overlap = min(overlap, size - 1)
    stride = size - overlap
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    chunks = sorted(doc_chunks(df, size=size, overlap=overlap).collect(),
                    key=lambda r: r["chunk_id"])
    if not words:
        assert chunks == []  # empty doc: no rows
        return
    # ids contiguous from 0; every chunk reproduces its token window; the
    # chunk starts tile [0, n) so every token is covered
    assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
    for c in chunks:
        lo = c["chunk_id"] * stride
        assert c["chunk_text"] == " ".join(words[lo:lo + size])
        assert c["n_tokens"] == len(words[lo:lo + size])
    assert (len(chunks) - 1) * stride < len(words)


@settings(max_examples=8, deadline=None)
@given(lens=st.lists(st.integers(0, 30), min_size=1, max_size=25),
       budget=st.integers(1, 40))
def test_pack_sequences_matches_exclusive_cumsum(spark, lens, budget):
    from bqetl_spark.functions.chunking import pack_sequences

    rows = [(i, " ".join(["w"] * n), "s") for i, n in enumerate(lens)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: r["pack_id"] for r in
           pack_sequences(df, budget=budget).collect()}
    cum = 0
    for i, n in enumerate(lens):
        assert got[i] == cum // budget  # exclusive running sum, id order
        cum += n


@settings(max_examples=8, deadline=None)
@given(l=st.lists(st.tuples(st.integers(0, 50), st.integers(0, 12)),
                  min_size=1, max_size=12),
       r=st.lists(st.tuples(st.integers(0, 50), st.integers(0, 12)),
                  min_size=1, max_size=12),
       width=st.integers(1, 20))
def test_interval_overlap_equals_naive_any_width(spark, l, r, width):
    from bqetl_spark.operators.rangejoin import interval_overlap_join

    lt = [(i, lo, lo + ln) for i, (lo, ln) in enumerate(l)]
    rt = [(j, lo, lo + ln) for j, (lo, ln) in enumerate(r)]
    ldf = spark.createDataFrame(lt, "a_id long, a_lo long, a_hi long")
    rdf = spark.createDataFrame(rt, "b_id long, b_lo long, b_hi long")
    got = {(x["a_id"], x["b_id"]) for x in interval_overlap_join(
        ldf, rdf, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=width).collect()}
    want = {(a, b) for a, alo, ahi in lt for b, blo, bhi in rt
            if alo <= bhi and blo <= ahi}
    assert got == want  # exact for every bucket width, no dupes, no misses


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(st.lists(st.sampled_from("abcdefgh"), min_size=0,
                              max_size=40).map(" ".join),
                     min_size=1, max_size=20),
       k=st.integers(2, 10))
def test_heavy_hitters_exact_vs_bruteforce(spark, docs, k):
    from collections import Counter

    from bqetl_spark.functions.sketch import heavy_hitter_tokens

    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "doc_id long, text string")
    got = {r["tok"]: r["n_occurrences"]
           for r in heavy_hitter_tokens(df, k=k).collect()}
    counts = Counter(t for d in docs for t in d.split())
    n = sum(counts.values())
    want = {t: c for t, c in counts.items() if c * k > n}
    assert got == want  # exact despite the sketch: coverage + recount


def _zdecode(z: int, k: int, bits: int) -> tuple:
    vals = [0] * k
    for b in range(bits):
        for i in range(k):
            vals[i] |= ((z >> (b * k + i)) & 1) << b
    return tuple(vals)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, (1 << 16) - 1),
                          st.integers(0, (1 << 16) - 1)),
                min_size=1, max_size=30))
def test_zorder_key_is_bijective(spark, pts):
    """The Morton key loses nothing: decoding the interleaved bits
    recovers exactly the masked inputs (a lossy layout key would make
    file pruning unsound)."""
    from bqetl_spark.operators.layout import zorder_key

    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select("x", "y",
                     zorder_key(["x", "y"], bits=16).alias("z")).collect()
    for r in rows:
        assert _zdecode(r["z"], 2, 16) == (r["x"], r["y"])


@settings(max_examples=6, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                min_size=0, max_size=60),
       st.sampled_from(["inner", "left"]))
def test_salted_join_auto_equivalence_property(spark, rows, how):
    """Adaptive salting is value-invisible for ARBITRARY key skew and both
    supported join directions (hypothesis drives hot/uniform/empty
    distributions, incl. keys missing from the right side)."""
    from bqetl_spark.operators.skew import salted_join

    left = (spark.createDataFrame(rows, "k int, v int") if rows
            else spark.createDataFrame([], "k int, v int"))
    right = spark.createDataFrame([(0, "a"), (1, "b"), (9, "z")],
                                  "rk int, rv string")
    plain = sorted((r["k"], r["v"], r["rv"]) for r in
                   left.join(right, left["k"] == right["rk"], how).collect())
    auto = sorted((r["k"], r["v"], r["rv"]) for r in
                  salted_join(left, right, "k", "rk", salt=None,
                              how=how).collect())
    assert auto == plain
