"""Lexical relevance scoring (TF-IDF) for corpus filtering and retrieval.

Beyond-reference surface: a training-data pipeline uses lexical scores to
pull topic-relevant slices out of a web corpus ("find the docs that look
like math") long before any embedding model runs — it is the cheap
first-stage retriever. Everything here is Catalyst expressions over an
exploded token relation; Python never touches a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bqetl_spark.functions.text import tokens

IDF_SCALE = 10**6


def tfidf_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k documents by TF-IDF score for a bag of query terms.

    Scoring is integerized for cross-engine determinism:

        idf(t)      = floor(IDF_SCALE · ln(N / df_t))
        score(d)    = Σ_{t ∈ query} tf(t,d) · idf(t)        (BIGINT)

    ln() is the one float op; its output is multiplied by 10^6 and
    floored, so the gate is deterministic as long as no idf value sits
    within float-noise of an integer boundary — audited on the real
    corpora by tests/test_oracle_margins.py (same discipline as the
    ANN cosine margins). Ties break by ascending doc id.

    Scale shape: the term filter lands BEFORE the tf aggregation, so the
    exploded token relation is pruned to query terms at the scan-side of
    the first shuffle — df and tf are computed over |query| terms' rows
    only, never the full token inventory. N (corpus size) is a metadata
    scalar. Top-k is a single ORDER BY LIMIT k (Spark's TakeOrdered), no
    full sort.

    Returns (doc_id, score BIGINT, rank INT) — rank 1 = best.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n_docs = docs.count()  # metadata scalar
    tok = (docs.select(F.col(id_col),
                       F.explode(tokens(F.col(text_col))).alias("tok"))
           .filter(F.col("tok").isin(query_terms)))
    tf = tok.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    # document frequency per term: tf rows are already (doc, term)-unique
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = df_t.select(
        "tok",
        F.floor(F.lit(IDF_SCALE)
                * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("idf"))
    scored = (tf.join(F.broadcast(idf), "tok")
              .groupBy(id_col)
              .agg(F.sum(F.col("tf") * F.col("idf")).alias("score")))
    # Unpartitioned Window AFTER the .limit(k): the logged "No Partition
    # Defined" warning is cosmetic here — the window input is the top-k
    # rows (k <= ~1024 in every caller), not the corpus; the distributed
    # heavy lifting is the TakeOrdered(k) in the limit. Boundedness is
    # pinned by tests/test_retrieval.py (test_topk_window_input_is_bounded).
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("int")))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k documents by BM25 (r7) — TF-IDF's production successor:
    term-frequency saturation (k1) plus document-length normalization
    (b), the default lexical ranker in every search stack.

    With k1 = 6/5 and b = 3/4 the whole score is RATIONAL, so unlike
    tfidf_topk only the idf ln needs integerizing — the rest is exact
    integer arithmetic on both engines:

        idf(t)     = floor(10^6 · ln((2N+2)/(2·df_t+1)))
                     (Lucene's ln(1 + (N−df+0.5)/(df+0.5)) with the
                      halves cleared; always > 0, so integer division
                      truncation ≡ floor on both engines)
        contrib    = (idf · 22 · tf · T) div (10·tf·T + 3·T + 9·dl·N)
                     — tf·(k1+1)·idf / (tf + k1·(1−b+b·dl/avgdl)) with
                     avgdl = T/N cleared of fractions; DECIMAL(38,0)
                     div on Spark ≡ HUGEINT // on DuckDB (probed equal)
        score(d)   = Σ_{t ∈ query} contrib(t, d)          (BIGINT)

    N (corpus docs) and T (corpus tokens) are metadata scalars. The
    idf floor boundaries are margin-audited on the real corpora by
    tests/test_oracle_margins.py.

    Scale shape mirrors tfidf_topk: the term filter lands before the tf
    aggregation (the exploded relation is pruned to query terms at the
    first shuffle's map side); dl rides along from the same row as the
    explode, so no corpus-wide join; top-k is TakeOrdered, no full sort.

    Returns (doc_id, score BIGINT, rank INT) — rank 1 = best; ties break
    by ascending doc id.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    live = docs.filter(F.trim(F.col(text_col)) != "")
    n_docs = live.count()                                 # metadata scalar
    total_tokens = live.select(
        F.sum(F.size(tokens(F.col(text_col)))).alias("t")
    ).collect()[0]["t"] or 0                              # metadata scalar
    tok = live.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("dl"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).filter(F.col("tok").isin(query_terms))
    tf = (tok.groupBy(id_col, "tok")
          .agg(F.count("*").alias("tf"), F.max("dl").alias("dl")))
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = df_t.select(
        "tok",
        F.floor(F.lit(IDF_SCALE)
                * F.log(F.lit(float(2 * n_docs + 2))
                        / (F.lit(2) * F.col("df") + 1))).alias("idf"))
    dec = "DECIMAL(38,0)"
    contrib = F.expr(
        f"CAST(idf AS {dec}) * 22 * tf * CAST({total_tokens} AS {dec}) div "
        f"(CAST(10 AS {dec}) * tf * CAST({total_tokens} AS {dec}) "
        f" + CAST(3 AS {dec}) * CAST({total_tokens} AS {dec}) "
        f" + CAST(9 AS {dec}) * dl * CAST({n_docs} AS {dec}))")
    scored = (tf.join(F.broadcast(idf), "tok")
              .withColumn("__c", contrib)
              .groupBy(id_col)
              .agg(F.sum("__c").cast("long").alias("score")))
    # Unpartitioned Window AFTER .limit(k): k-bounded, same proof as
    # tfidf_topk (tests/test_retrieval.py pins the topk bound pattern).
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("int")))


def tfidf_doc_pairs(docs: DataFrame, min_cos2_ppm: int = 250_000,
                    max_df: int = 50, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """All-pairs lexical document similarity — SemDeDup's lexical
    sibling: TF-IDF cosine over an inverted index, for topic clustering
    and near-topic dedup where no embeddings exist yet.

    Exactness: cosine needs a square root, so the gate publishes the
    SQUARED cosine as an integer rational instead —

        w(t,d)    = tf(t,d) · floor(10³·ln(N/df_t))        (BIGINT)
        cos²(a,b) = (Σ_t w_a w_b)² / (Σ w_a² · Σ w_b²)
        cos2_ppm  = dot²·10⁶ div (n_a·n_b)

    evaluated in DECIMAL(38)/HUGEINT. The 10³ idf scale (not tfidf's
    10⁶) is what keeps dot²·10⁶ inside 38 digits — exact while
    tf·idf_e3 stays < ~10⁹ per term (any plausible document); observed
    ln floors are margin-audited like every other idf here.

    Similarity space: terms with df_t > ``max_df`` (or df_t < 2) are
    excluded from BOTH the candidates and the norms — the cosine is
    computed self-consistently in the pruned term space (the
    ngram_jaccard df-cap discipline: hot boilerplate terms would
    otherwise pair everything with everything; the cap bounds per-term
    join fanout at max_df², which is what makes the self-join scale).

    Shape: one tf aggregation, one df aggregation, posting-list
    self-join on the term key (equi-join), one (a, b) dot aggregation,
    two broadcast-eligible norm joins. Returns
    (doc_a, doc_b, n_shared, cos2_ppm), pairs canonical a < b.
    """
    if not 0 <= min_cos2_ppm <= 10**6:
        raise ValueError(f"min_cos2_ppm must be in [0, 1e6], got "
                         f"{min_cos2_ppm}")
    if max_df < 2:
        raise ValueError(f"max_df must be >= 2, got {max_df}")
    base = docs.filter(F.trim(F.col(text_col)) != "")
    n_docs = base.count()  # metadata scalar
    tf = (base.select(F.col(id_col).alias("__d"),
                      F.explode(tokens(F.col(text_col))).alias("__t"))
          .groupBy("__d", "__t").agg(F.count("*").alias("__tf")))
    dfreq = (tf.groupBy("__t").agg(F.count("*").alias("__df"))
             .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df)))
    idf = F.floor(F.lit(1000) * F.log(F.lit(float(n_docs))
                                      / F.col("__df").cast("double")))
    post = (tf.join(dfreq, "__t")
            .select("__t", "__d",
                    (F.col("__tf") * idf).cast("long").alias("__w"))
            # a df == N term has idf exactly 0: zero-weight postings
            # carry no signal but would put 0 norms under the division
            # (the fuzz tier found the two-identical-one-word-doc case)
            .filter(F.col("__w") > 0))
    norms = (post.groupBy("__d")
             .agg(F.sum(F.expr("CAST(__w AS DECIMAL(19,0)) * __w"))
                  .cast("decimal(38,0)").alias("__n2")))
    a = post.select("__t", F.col("__d").alias("__a"),
                    F.col("__w").alias("__wa"))
    b = post.select("__t", F.col("__d").alias("__b"),
                    F.col("__w").alias("__wb"))
    dots = (a.join(b, "__t")
            .filter(F.col("__a") < F.col("__b"))
            .groupBy("__a", "__b")
            .agg(F.count("*").alias("__ns"),
                 F.sum(F.expr("CAST(__wa AS DECIMAL(19,0)) * __wb"))
                 .cast("decimal(38,0)").alias("__dot")))
    na = norms.select(F.col("__d").alias("__a"), F.col("__n2").alias("__na"))
    nb = norms.select(F.col("__d").alias("__b"), F.col("__n2").alias("__nb"))
    cos2 = F.expr("""
        CAST(__dot * __dot * 1000000 AS DECIMAL(38,0))
        div CAST(__na * __nb AS DECIMAL(38,0))""")
    return (dots.join(na, "__a").join(nb, "__b")
            .select(F.col("__a").alias("doc_a"),
                    F.col("__b").alias("doc_b"),
                    F.col("__ns").cast("long").alias("n_shared"),
                    cos2.cast("long").alias("cos2_ppm"))
            .filter(F.col("cos2_ppm") >= min_cos2_ppm))


def hybrid_rrf(lex: DataFrame, dense: DataFrame, k: int = 10,
               rrf_k: int = 60, id_col: str = "doc_id") -> DataFrame:
    """Reciprocal-rank fusion (r11) — the standard hybrid-search merge
    (Cormack et al. 2009; the default fusion in every lexical+dense
    production stack): combine a lexical ranking and a dense ranking of
    the same id space by

        rrf(d) = Σ_systems 10⁶ div (rrf_k + rank_system(d))

    integerized exactly (floor of a positive rational — Spark div and
    DuckDB // agree), with a missing rank contributing 0. Takes any two
    (id, rank) tables (here: bm25_topk and cosine_topk outputs), so the
    fusion composes certified rankers without re-scoring anything.

    Scale shape: both inputs are top-K lists (K rows, not corpora); the
    fusion is one K-row full outer join + a TakeOrdered(k). Returns
    (id_col, rrf_score BIGINT, lex_rank, dense_rank, rank INT) — rank 1
    best, ties by ascending id."""
    if k < 1 or rrf_k < 1:
        raise ValueError(f"k and rrf_k must be >= 1, got {k}, {rrf_k}")
    l = lex.select(F.col(id_col).alias("id"),
                   F.col("rank").alias("lex_rank"))
    d = dense.select(F.col(id_col).alias("id"),
                     F.col("rank").alias("dense_rank"))
    fused = (l.join(d, "id", "full")
             .withColumn(
                 "rrf_score",
                 (F.coalesce(F.expr(f"1000000 div ({rrf_k} + lex_rank)"),
                             F.lit(0))
                  + F.coalesce(
                      F.expr(f"1000000 div ({rrf_k} + dense_rank)"),
                      F.lit(0))).cast("long")))
    # Unpartitioned Window AFTER .limit(k): k-bounded, the tfidf_topk
    # pattern (tests/test_retrieval.py pins the bound).
    w = Window.orderBy(F.desc("rrf_score"), F.asc("id"))
    return (fused.orderBy(F.desc("rrf_score"), F.asc("id")).limit(k)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .select(F.col("id").alias(id_col), "rrf_score",
                    "lex_rank", "dense_rank", "rank"))


def _dcg_discounts(k: int) -> list[int]:
    """DCG position discounts, integerized ONCE in Python and inlined as
    CONSTANTS into both engines (the phash DCT-table discipline — the
    only irrational, 1/log2(i+1), never enters either engine):
    d_i = floor(10⁶ / log2(i+1)) for rank i = 1..k."""
    import math

    return [math.floor(10**6 / math.log2(i + 1)) for i in range(1, k + 1)]


def ndcg_eval(rankings: dict[str, DataFrame], relevance: DataFrame,
              k: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Ranking evaluation as a first-class op (r11): graded-relevance
    DCG@k for several systems side by side, plus the corpus ideal —
    the eval step that closes the retrieval loop the way
    langid_confusion closes the classifier loop.

        dcg_micro(sys)  = Σ_{i≤k} rel(doc at rank i) · d_i
        ideal_micro     = Σ_{i≤k} (i-th best corpus relevance) · d_i

    with d_i = floor(10⁶/log2(i+1)) precomputed constants — ALL-INTEGER
    in both engines (report nDCG as dcg_micro/ideal_micro downstream if
    a float is wanted; the gate publishes the exact numerators).
    ``relevance`` is (id, rel BIGINT); docs absent from it count 0.
    Ideal ordering ties break by ascending id (deterministic).

    Scale shape: each ranking is a ≤k-row list — joins are k-row
    broadcasts against the relevance table; the ideal is one
    TakeOrdered(k) over relevance. Returns (system, dcg_micro,
    ideal_micro, n_scored) sorted by system."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not rankings:
        raise ValueError("rankings must be non-empty")
    disc = _dcg_discounts(k)
    dmap = F.create_map(*[F.lit(x) for pair in
                          ((i + 1, d) for i, d in enumerate(disc))
                          for x in pair])
    rel = relevance.select(F.col(id_col).alias("__rid"),
                           F.col("rel").cast("long").alias("__rel"))
    ideal_row = (rel.orderBy(F.desc("__rel"), F.asc("__rid")).limit(k)
                 .withColumn("__rk", F.row_number().over(
                     Window.orderBy(F.desc("__rel"), F.asc("__rid"))))
                 .select((F.col("__rel") * dmap[F.col("__rk")])
                         .alias("__g"))
                 .agg(F.coalesce(F.sum("__g"), F.lit(0))
                      .cast("long").alias("ideal_micro")))
    out = None
    for name in sorted(rankings):
        r = rankings[name].filter(F.col("rank") <= k)
        sys_row = (r.join(rel, r[id_col] == rel["__rid"], "left")
                   .select((F.coalesce("__rel", F.lit(0))
                            * dmap[F.col("rank")]).alias("__g"))
                   .agg(F.coalesce(F.sum("__g"), F.lit(0))
                        .cast("long").alias("dcg_micro"),
                        F.count("*").cast("long").alias("n_scored"))
                   .select(F.lit(name).alias("system"), "dcg_micro",
                           "n_scored"))
        out = sys_row if out is None else out.unionByName(sys_row)
    return (out.crossJoin(F.broadcast(ideal_row))
            .select("system", "dcg_micro", "ideal_micro", "n_scored"))
