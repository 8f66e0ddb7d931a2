"""Embedding similarity search over an array<float> column.

Two tiers, as a 100 TB design demands:

- brute-force cosine top-k — the exactness baseline. Dot products via
  zip_with/aggregate (pure codegen); the per-query top-k is a window over the
  scored pairs. Right-side (corpus) stays partitioned; queries broadcast.
- LSH-bucketed ANN — random-hyperplane signatures (deterministic,
  index-derived planes) bucket the corpus; candidates only within matching
  buckets (multi-probe via multiple tables). Recall/latency dial =
  (n_tables, n_bits).

Scale notes: brute force is O(Q·N) — fine when Q is small and broadcast;
the LSH path is the one that survives N at corpus scale, because the join is
bucket-equality, not cross.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bqetl_spark.caching import ckpt, pin
from bqetl_spark.session import compute_parallelism


def _dot(a, b):
    # cast each float to double BEFORE multiplying: the product of two
    # doubles-from-floats is exact, and the left-to-right double fold is then
    # bit-identical across engines (the DuckDB oracle does the same)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0).cast("double"), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                score_decimals: int = 4) -> DataFrame:
    """Exact top-k neighbors per query by cosine.

    Output: (query_id, neighbor_id, rank, score). Queries are broadcast
    (small side), the corpus is never moved — the cross join is map-side.
    Ties break by neighbor_id for determinism; scores rounded to keep
    cross-engine comparisons stable.
    """
    # Precompute each vector's norm ONCE (higher-order array folds are
    # CodegenFallback — interpreted — so per-pair recomputation is the cost
    # driver), and spread the single parquet split across the cluster.
    n_part = compute_parallelism(corpus.sparkSession)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec")) \
               .withColumn("q_norm", _norm(F.col("q_vec")))
    c = corpus.repartition(n_part) \
              .select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("c_vec")) \
              .withColumn("c_norm", _norm(F.col("c_vec")))
    scored = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .withColumn("score",
                          _dot(F.col("q_vec"), F.col("c_vec"))
                          / (F.col("q_norm") * F.col("c_norm"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("score", score_decimals).alias("score")))


def hard_negatives(corpus: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label",
                   score_decimals: int = 4) -> DataFrame:
    """Hard-negative mining for contrastive training: per query vector,
    the k most-cosine-similar corpus vectors carrying a DIFFERENT label —
    the negatives that sit closest to the decision boundary, which is
    what metric-learning losses (InfoNCE, triplet) want batched with
    each anchor.

    Same scale shape as :func:`cosine_topk` (queries broadcast, corpus
    never moved, per-query window top-k = TakeOrdered-style partial
    ranking); the label filter rides the broadcast-join condition so
    same-label pairs never materialize. NULL labels: the inequality is
    null-safe (NULL is a label distinct from every non-NULL label and
    equal to itself), matching SQL's IS DISTINCT FROM.

    Output: (query_id, query_label, neighbor_id, neighbor_label, rank,
    score).
    """
    n_part = compute_parallelism(corpus.sparkSession)
    q = (queries.select(F.col(id_col).alias("query_id"),
                        F.col(label_col).alias("query_label"),
                        F.col(vec_col).alias("q_vec"))
         .withColumn("q_norm", _norm(F.col("q_vec"))))
    c = (corpus.repartition(n_part)
         .select(F.col(id_col).alias("neighbor_id"),
                 F.col(label_col).alias("neighbor_label"),
                 F.col(vec_col).alias("c_vec"))
         .withColumn("c_norm", _norm(F.col("c_vec"))))
    scored = (c.join(F.broadcast(q),
                     ~F.col("query_label").eqNullSafe(F.col("neighbor_label")))
              .withColumn("score",
                          _dot(F.col("q_vec"), F.col("c_vec"))
                          / (F.col("q_norm") * F.col("c_norm"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("neighbor_id"))
    return (scored
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "query_label", "neighbor_id",
                    "neighbor_label", "rank",
                    F.round("score", score_decimals).alias("score")))


def hard_negatives_ann(corpus: DataFrame, queries: DataFrame, k: int = 10,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       label_col: str = "label",
                       n_lists: int = 16, n_probe: int = 4,
                       score_decimals: int = 4) -> DataFrame:
    """Hard-negative mining through the IVF candidate path — the
    PRODUCTION shape of :func:`hard_negatives` (r6 verdict item 5): the
    brute-force variant's broadcast non-equi join is the deliberate
    baseline, but at 100 TB the corpus side must be bucket-pruned, not
    scanned per query. Composition: corpus vectors coarse-assign to
    their 1 nearest of ``n_lists`` seed lists (Arrow-vectorized, same
    machinery as :func:`ivf_topk`), queries probe their ``n_probe``
    nearest lists, candidates come from the EQUI-join on list_id (no
    BNLJ anywhere in the plan), and the null-safe label inequality
    (IS DISTINCT FROM semantics) prunes candidates BEFORE scoring.

    Approximate by design — recall vs the exact miner is floored in
    tests/test_ann_recall.py; determinism (stride seeds + stable argmax
    assignment) makes the full result SQL-replayable, so the gate is
    value-hash-checked like embed_ivf_topk, not rows-only.

    Output: (query_id, query_label, neighbor_id, neighbor_label, rank,
    score)."""
    stride = _count_stride(corpus, n_lists)
    seeds = (corpus.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
             .orderBy(id_col).limit(n_lists)
             .select(F.col(id_col).alias("list_id"),
                     F.col(vec_col).alias("centroid")))
    seed_rows = sorted(seeds.collect(), key=lambda r: r["list_id"])
    seed_ids = [int(r["list_id"]) for r in seed_rows]
    seed_vecs = [[float(x) for x in r["centroid"]] for r in seed_rows]

    def assign(df: DataFrame, prefix: str, keep: int) -> DataFrame:
        top_udf = _top_lists_udf(seed_ids, seed_vecs, keep)
        return (df.select(F.col(id_col).alias(f"{prefix}_id"),
                          F.col(label_col).alias(f"{prefix}_label"),
                          F.col(vec_col).alias(f"{prefix}_vec"))
                .select(f"{prefix}_id", f"{prefix}_label", f"{prefix}_vec",
                        F.explode(top_udf(F.col(f"{prefix}_vec")))
                        .alias("list_id")))

    c_assign = assign(corpus, "c", 1)
    q_assign = assign(queries, "q", n_probe)
    cand = (c_assign.join(F.broadcast(q_assign), "list_id")
            .filter((F.col("c_id") != F.col("q_id"))
                    & ~F.col("q_label").eqNullSafe(F.col("c_label")))
            .dropDuplicates(["q_id", "c_id"]))
    scored = cand.withColumn(
        "score", _dot(F.col("q_vec"), F.col("c_vec"))
        / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("q_id").alias("query_id"),
                    F.col("q_label").alias("query_label"),
                    F.col("c_id").alias("neighbor_id"),
                    F.col("c_label").alias("neighbor_label"), "rank",
                    F.round("score", score_decimals).alias("score")))


def cosine_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         block_col: str | None = None,
                         n_lists: int = 16) -> DataFrame:
    """All pairs with cosine ≥ threshold, without an all-pairs join.

    With ``block_col``: pairs only within the given blocking column.
    Without: centroid triangle-inequality pruning (the FAISS/IVF idea made
    exact): assign every vector to its nearest of ``n_lists`` stride-seeded
    centroids, record its angle to that centroid, and only join list pairs
    (i, j) where the spherical triangle inequality
    ``ang(c_i, c_j) − maxAng_i − maxAng_j ≤ arccos(threshold)`` admits a
    qualifying pair. Inside admitted list pairs a per-row bound
    ``ang(c_i, c_j) − ang_a − ang_b ≤ θ`` prunes before the exact fold.

    Exactness: angular distance is a metric on the unit sphere, so the
    bound can never drop a true pair — recall is 1 by construction, not by
    parameter luck, and the result is identical to the all-pairs scan.
    Scale shape: the candidate join is an equi-join on the partner list id
    (never a nested loop over all pairs); the admissible-pair table is
    n_lists², metadata-sized, and broadcast. Pruning power tracks how
    clustered the corpus is; the worst case degrades to the verified join,
    never to a wrong answer.
    """
    import math

    n_part = compute_parallelism(df.sparkSession)
    base = (df.repartition(n_part)
            .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                    *( [F.col(block_col).alias("blk")] if block_col else [] ))
            .withColumn("nrm", _norm(F.col("v"))))
    score = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    if block_col:
        a, b = base.alias("a"), base.alias("b")
        cond = (F.col("a.id") < F.col("b.id")) & (F.col("a.blk") == F.col("b.blk"))
        return (a.join(b, cond)
                .withColumn("score", score)
                .filter(F.col("score") >= threshold)
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                        F.round("score", 4).alias("score")))

    theta = math.acos(threshold)
    clamp = lambda c: F.least(F.lit(1.0), F.greatest(F.lit(-1.0), c))

    # deterministic stride-seeded centroids (metadata-sized: n_lists rows)
    stride = _count_stride(df, n_lists)
    cents = (df.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
             .orderBy(id_col).limit(n_lists)
             .select(F.col(id_col).alias("list_id"),
                     F.transform(F.col(vec_col),
                                 lambda x: x.cast("double")).alias("cv"))
             .withColumn("cnrm", _norm(F.col("cv"))))

    # assignment: nearest centroid per vector + angle to it (one broadcast
    # join against n_lists rows; the corpus never shuffles here)
    cs = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm"))
    w = Window.partitionBy("id").orderBy(F.desc("__cs"), F.asc("list_id"))
    assigned = (base.join(F.broadcast(cents)).withColumn("__cs", cs)
                .withColumn("__r", F.row_number().over(w))
                .filter(F.col("__r") == 1)
                .select("id", "v", "nrm", "list_id",
                        F.acos(clamp(F.col("__cs"))).alias("ang")))
    assigned = pin(assigned)

    # list radius (max member angle) → admissible ordered list pairs
    radii = assigned.groupBy("list_id").agg(F.max("ang").alias("max_ang"))
    x, y = cents.alias("x"), cents.alias("y")
    cang = F.acos(clamp(
        _dot(F.col("x.cv"), F.col("y.cv")) / (F.col("x.cnrm") * F.col("y.cnrm"))))
    cpairs = (x.join(y)
              .select(F.col("x.list_id").alias("li"),
                      F.col("y.list_id").alias("lj"), cang.alias("cang")))
    adm = (cpairs
           .join(radii.select(F.col("list_id").alias("li"),
                              F.col("max_ang").alias("ra")), "li")
           .join(radii.select(F.col("list_id").alias("lj"),
                              F.col("max_ang").alias("rb")), "lj")
           .filter(F.col("cang") - F.col("ra") - F.col("rb") <= F.lit(theta))
           .select("li", "lj", "cang"))

    # candidate equi-join on the partner list id; per-row triangle bound
    # prunes before the exact (oracle-identical) cosine fold runs
    a = assigned.select(F.col("id").alias("id_a"), F.col("v").alias("__va"),
                        F.col("nrm").alias("__na"),
                        F.col("list_id").alias("li"), F.col("ang").alias("__aa"))
    b = assigned.select(F.col("id").alias("id_b"), F.col("v").alias("__vb"),
                        F.col("nrm").alias("__nb"),
                        F.col("list_id").alias("lj"), F.col("ang").alias("__ab"))
    pair_score = (_dot(F.col("__va"), F.col("__vb"))
                  / (F.col("__na") * F.col("__nb")))
    return (a.join(F.broadcast(adm), "li")
            .join(b, "lj")
            .filter((F.col("id_a") < F.col("id_b")) &
                    (F.col("cang") - F.col("__aa") - F.col("__ab") <= F.lit(theta)))
            .withColumn("score", pair_score)
            .filter(F.col("score") >= threshold)
            .select("id_a", "id_b", F.round("score", 4).alias("score")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_lists: int = 16, n_probe: int = 4,
             score_decimals: int = 4, refine_iters: int = 0) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus against a small
    set of seed centroids, probe only the query's ``n_probe`` nearest lists,
    exact cosine re-rank inside them.

    Seeds are corpus vectors picked deterministically (every Nth id) — a
    k-means pass would refine them, but seeded IVF already gives the scale
    shape: corpus assignment is one broadcast join against ``n_lists``
    seeds; the query touches n_probe/n_lists of the data. Approximate by
    design (recall < 1) → rows-only check in the driver contract.
    """
    # seed selection by id stride — no global sort (a Window.orderBy here
    # would serialize the corpus through one partition); optional Lloyd
    # refinement tightens the lists at the cost of 2 jobs per iteration
    if refine_iters > 0:
        seeds = kmeans_refine(corpus, n_lists, refine_iters, id_col, vec_col)
    else:
        stride = _count_stride(corpus, n_lists)
        seeds = (corpus.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
                 .orderBy(id_col).limit(n_lists)
                 .select(F.col(id_col).alias("list_id"),
                         F.col(vec_col).alias("centroid")))

    # Collecting the seeds is metadata-scale by construction (n_lists rows);
    # the vectorized assignment then needs neither the n_lists-fold row
    # blowup of a broadcast cross join nor a window shuffle over it — one
    # Arrow map stage per side, which is the shape that survives 100 TB.
    seed_rows = sorted(seeds.collect(), key=lambda r: r["list_id"])
    seed_ids = [int(r["list_id"]) for r in seed_rows]
    seed_vecs = [[float(x) for x in r[seeds.columns[1]]] for r in seed_rows]

    def assign(df: DataFrame, prefix: str, keep: int) -> DataFrame:
        """nearest `keep` lists per vector by cosine against the seeds"""
        top_udf = _top_lists_udf(seed_ids, seed_vecs, keep)
        return (df.select(F.col(id_col).alias(f"{prefix}_id"),
                          F.col(vec_col).alias(f"{prefix}_vec"))
                .select(f"{prefix}_id", f"{prefix}_vec",
                        F.explode(top_udf(F.col(f"{prefix}_vec")))
                        .alias("list_id")))

    c_assign = assign(corpus, "c", 1)          # each corpus vector in 1 list
    q_assign = assign(queries, "q", n_probe)   # queries probe several
    cand = (c_assign.join(F.broadcast(q_assign), "list_id")
            .filter(F.col("c_id") != F.col("q_id"))
            .dropDuplicates(["q_id", "c_id"]))
    scored = cand.withColumn(
        "score", _dot(F.col("q_vec"), F.col("c_vec"))
        / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))))
    w = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("c_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("q_id").alias("query_id"),
                    F.col("c_id").alias("neighbor_id"), "rank",
                    F.round("score", score_decimals).alias("score")))


def _top_lists_udf(seed_ids: list[int], seed_vecs: list[list[float]],
                   keep: int):
    """Arrow-vectorized IVF coarse assignment: per row, the ids of the
    `keep` nearest seed centroids by cosine (ties broken by ascending
    list_id, matching the window ordering it replaces). Self-contained
    closure for worker-side pickling."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    C = np.asarray(seed_vecs, dtype=np.float64)          # (n_lists, dim)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    ids = np.asarray(seed_ids, dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def top_lists(v):
        import numpy as np
        import pandas as pd
        if len(v) == 0:
            return pd.Series([], dtype="object")
        Vm = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        nrm = np.linalg.norm(Vm, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        S = (Vm / nrm) @ Cn.T                            # (n, n_lists)
        # columns are in ascending list_id order, so a STABLE sort on
        # -score breaks ties by ascending list_id — same ordering as the
        # desc-score/asc-id window it replaces
        order = np.argsort(-S, axis=1, kind="stable")
        return pd.Series(list(ids[order[:, :keep]]))
    return top_lists


def _count_stride(corpus: DataFrame, n_lists: int) -> int:
    # deterministic seed stride; a count here is a tiny metadata-scale job
    n = corpus.count()
    return max(1, n // n_lists)


def kmeans_refine(corpus: DataFrame, n_lists: int = 16, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Lloyd iterations to refine IVF centroids: assign every vector to its
    nearest centroid (broadcast join against n_lists centroids), then
    recompute each centroid as the element-wise mean of its members.

    The iterative-algorithm shape on Spark: a short driver-side loop where
    each iteration is two distributed jobs (assignment map + mean reduce);
    no data ever collects to the driver except the n_lists centroid vectors
    themselves (metadata-sized by construction). Returns
    (list_id, centroid: array<double>).
    """
    stride = _count_stride(corpus, n_lists)
    centroids = (corpus.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
                 .orderBy(id_col).limit(n_lists)
                 .select(F.col(id_col).alias("list_id"),
                         F.transform(F.col(vec_col),
                                     lambda x: x.cast("double")).alias("centroid")))
    vecs = corpus.select(F.col(id_col).alias("vid"),
                         F.transform(F.col(vec_col),
                                     lambda x: x.cast("double")).alias("v"))
    # Centroids live driver-side between iterations (the MLlib k-means
    # shape): they are metadata by construction, and threading them through
    # as DataFrames would re-run the whole unfused lineage once per collect.
    # Each iteration is exactly one distributed job — a vectorized Arrow
    # assignment map + element-wise mean reduce — collecting n_lists rows.
    cent = {int(r["list_id"]): [float(x) for x in r["centroid"]]
            for r in centroids.collect()}
    for _ in range(iters):
        ids = sorted(cent)
        nearest = _top_lists_udf(ids, [cent[i] for i in ids], keep=1)
        assigned = vecs.select(
            "vid", "v", F.explode(nearest(F.col("v"))).alias("list_id"))
        # element-wise mean per list: explode to (list, dim_idx, value),
        # average, re-assemble — stays distributed for any dimension count.
        # The mean is FIXED-POINT EXACT: components quantized to a 2^-24
        # grid (float32-epsilon scale, so no effective precision loss) and
        # summed as integers, making the centroid independent of partition
        # / summation order — bit-reproducible across runs AND engines
        # (the DuckDB oracle computes the identical integer sum). A plain
        # F.avg here would be an order-dependent float sum: correct, but
        # unverifiable by differential testing.
        dims = (assigned.select("list_id", F.posexplode("v").alias("i", "x"))
                .groupBy("list_id", "i")
                .agg((F.sum(F.floor(F.col("x") * F.lit(16777216.0))
                            .cast("long")).cast("double")
                      / (F.count("*").cast("double") * F.lit(16777216.0)))
                     .alias("m")))
        new_cent = (dims.groupBy("list_id")
                    .agg(F.array_sort(F.collect_list(F.struct("i", "m")))
                         .alias("im"))
                    .select("list_id",
                            F.transform("im", lambda s: s["m"]).alias("centroid")))
        # a list can go empty (no nearest vectors); its centroid carries over
        cent = {**cent,
                **{int(r["list_id"]): [float(x) for x in r["centroid"]]
                   for r in new_cent.collect()}}
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(i, cent[i]) for i in sorted(cent)], ["list_id", "centroid"])


def _hyperplane(dim: int, table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: weights in {-2..2} derived by
    integer mixing of (table, bit, i). No RNG — reproducible across engines
    and runs."""
    w = []
    for i in range(dim):
        m = (i * 2654435761 + bit * 40503 + table * 69069 + 12345) & 0xFFFFFFFF
        m ^= m >> 16
        w.append(float((m % 5) - 2))
    return w


def _plane_sigs_udf(planes: list[list[float]], n_tables: int, n_bits: int):
    """Arrow-vectorized signature UDF: per row, the n_tables LSH bucket ids
    from all hyperplane projections at once. `planes` is row-major
    (table-major, bit-minor). Self-contained closure — only locals are
    captured, so cloudpickle ships it without needing bqetl_spark importable
    on the workers."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    W = np.asarray(planes, dtype=np.float64).T          # (dim, tables*bits)
    shifts = np.arange(n_bits, dtype=np.int64)          # bit b -> 1 << b

    @pandas_udf(ArrayType(IntegerType()))
    def sigs(v):
        import numpy as np
        import pandas as pd
        if len(v) == 0:
            return pd.Series([], dtype="object")
        Vm = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (Vm @ W >= 0).astype(np.int64)           # (n, tables*bits)
        per_table = bits.reshape(len(v), n_tables, n_bits)
        sig = (per_table << shifts).sum(axis=2).astype(np.int32)
        return pd.Series(list(sig))
    return sigs


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dim: int = 64, n_tables: int = 4, n_bits: int = 8,
                    score_decimals: int = 4) -> DataFrame:
    """ANN top-k: random-hyperplane LSH buckets × n_tables, exact cosine
    re-rank within candidate buckets. Approximate — recall < 1 by design;
    the scale path when brute force is too expensive.

    Output: (query_id, neighbor_id, rank, score) with rank over retrieved
    candidates.
    """
    # All n_tables*n_bits hyperplane projections in ONE Arrow batch matmul.
    # The per-bit aggregate/zip_with fold this replaces is CodegenFallback
    # (interpreted) and carries seconds of planning overhead for 32+ nested
    # fold expressions; a (batch, dim) @ (dim, tables*bits) numpy product is
    # a single vectorized pass and the same sign convention (proj >= 0).
    planes = [_hyperplane(dim, t, b) for t in range(n_tables)
              for b in range(n_bits)]
    sigs_udf = _plane_sigs_udf(planes, n_tables, n_bits)

    def bucketize(df: DataFrame, prefix: str) -> DataFrame:
        out = df.select(F.col(id_col).alias(f"{prefix}_id"),
                        F.col(vec_col).alias(f"{prefix}_vec"))
        return out.select(f"{prefix}_id", f"{prefix}_vec",
                          F.posexplode(sigs_udf(F.col(f"{prefix}_vec")))
                          .alias("table", f"{prefix}_sig"))

    cbuck = bucketize(corpus, "c")
    qbuck = bucketize(queries, "q")
    cand = (cbuck.join(F.broadcast(qbuck),
                       (cbuck["table"] == qbuck["table"]) &
                       (F.col("c_sig") == F.col("q_sig")) &
                       (F.col("c_id") != F.col("q_id")))
            .select(F.col("q_id").alias("query_id"),
                    F.col("c_id").alias("neighbor_id"),
                    "q_vec", "c_vec")
            .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cand.withColumn(
        "score", _dot(F.col("q_vec"), F.col("c_vec"))
        / (_norm(F.col("q_vec")) * _norm(F.col("c_vec"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("score", score_decimals).alias("score")))


def assign_cells(corpus: DataFrame, n_lists: int = 8, iters: int = 2,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """k-means cell assignment for SemDeDup: refine stride-seeded centroids
    (kmeans_refine) and attach each vector's nearest cell as cluster_id.
    Exposed separately so an invariant test (and any caller that wants to
    reuse one clustering across operations) can hold the assignment fixed.
    """
    cents = kmeans_refine(corpus, n_lists=n_lists, iters=iters,
                          id_col=id_col, vec_col=vec_col)
    rows = cents.collect()  # n_lists rows: metadata by construction
    nearest = _top_lists_udf([int(r["list_id"]) for r in rows],
                             [[float(x) for x in r["centroid"]] for r in rows],
                             keep=1)
    return (corpus
            .select(id_col, vec_col)
            .withColumn("cluster_id",
                        F.explode(nearest(F.transform(
                            F.col(vec_col),
                            lambda x: x.cast("double"))))))


def semantic_dedup(corpus: DataFrame, threshold: float = 0.85,
                   n_lists: int = 8, iters: int = 2,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   assignments: DataFrame | None = None) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 shape):
    k-means-cluster the embeddings, then drop every document that has a
    lower-id near-duplicate (cosine >= threshold) WITHIN its cluster.
    Returns the kept set as (id_col, cluster_id).

    This is the scale path for embedding dedup at 100 TB: the exact
    variant (cosine_neardup_pairs without blocking) verifies every
    centroid-admissible pair; here candidate generation is confined to
    k-means cells, so work is sum-of-squares of cell sizes, tunable with
    n_lists, and each cell's pair join is an equi-join on cluster_id.
    Cross-cluster duplicates are the documented recall loss — SemDeDup's
    own approximation — bounded in tests against the exact pair oracle.

    Drop rule: any member with a smaller-id neighbor above threshold in
    its cluster is dropped. One distributed pass over the pair list (no
    connected components): a duplicate CHAIN keeps only its smallest id
    if the chain is transitively connected above threshold within the
    cell, and never drops a document that has no qualifying neighbor.
    """
    assigned = (assignments if assignments is not None
                else assign_cells(corpus, n_lists=n_lists, iters=iters,
                                  id_col=id_col, vec_col=vec_col))
    assigned = pin(assigned)
    pairs = cosine_neardup_pairs(assigned, threshold=threshold,
                                 id_col=id_col, vec_col=vec_col,
                                 block_col="cluster_id")
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return (assigned.join(drops, id_col, "left_anti")
            .select(id_col, "cluster_id"))


def sq_quantize(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Int8 scalar quantization (symmetric, per-vector max-abs scale):
    ``code_i = round(x_i / (max|x|/127))``.

    The 100 TB rationale: brute-force scoring is memory-bandwidth-bound, and
    int8 codes are 4x smaller than float32 (8x vs double), so a scan-and-
    score pass moves 4-8x less data. Cosine over the codes needs NO
    dequantization — the per-vector scales cancel:
    ``cos_q = dot_int / (sqrt(nn_a) * sqrt(nn_b))`` with every operand an
    exact integer sum, which also makes the score bit-reproducible across
    engines (the only float ops are one sqrt/divide at the end).
    Returns (id, codes array<long>, nn = exact int self-dot).
    """
    scaled = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__v"),
        (F.array_max(F.transform(vec_col, lambda x: F.abs(x.cast("double"))))
         / F.lit(127.0)).alias("__s"))
    codes = scaled.select(
        "id",
        F.transform("__v", lambda x: F.round(x.cast("double") / F.col("__s"))
                    .cast("long")).alias("codes"))
    return codes.withColumn(
        "nn", F.aggregate(F.transform("codes", lambda c: c * c),
                          F.lit(0).cast("long"), lambda acc, v: acc + v))


def sq_cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   score_decimals: int = 6) -> DataFrame:
    """Brute-force top-k over int8-quantized vectors — same shape as
    ``cosine_topk`` (queries broadcast, corpus never moves) but the scan
    reads 4-8x fewer bytes per vector and the dot product is exact integer
    arithmetic. Approximation error comes only from the quantization grid;
    see tests/test_similarity.py for the recall floor vs the exact baseline.
    """
    n_part = compute_parallelism(corpus.sparkSession)
    q = (sq_quantize(queries, id_col, vec_col)
         .select(F.col("id").alias("query_id"), F.col("codes").alias("qc"),
                 F.col("nn").alias("qn")))
    c = (sq_quantize(corpus.repartition(n_part), id_col, vec_col)
         .select(F.col("id").alias("neighbor_id"), F.col("codes").alias("cc"),
                 F.col("nn").alias("cn")))
    dot = F.aggregate(F.zip_with("qc", "cc", lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .withColumn("score",
                          dot.cast("double") /
                          (F.sqrt(F.col("qn").cast("double")) *
                           F.sqrt(F.col("cn").cast("double")))))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("score", score_decimals).alias("score")))


def embed_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Per-label mean embedding (class prototypes / mean pooling) with
    fixed-point integer sums, so the centroid is bit-identical across
    engines, partitionings and runs.

    Same arithmetic discipline as the k-means gate: each component is
    floored to a 2^-24 grid (float32 inputs lose nothing — cast to double
    and scaled by an exact power of two), summed as BIGINT (exact,
    order-free), and divided once at the end. The groupBy carries dim
    partial sums per label — map-side combine means the shuffle moves
    |labels|·(dim+1) longs per partition, never vectors.

    Contract: vectors are fixed-dim (``dim``); a shorter vector yields
    NULL for its missing components, which SUM skips — the affected
    component means silently over-weight the remaining rows. Validate
    dimensionality upstream if the corpus can be ragged.
    """
    q = 16777216.0  # 2^24, exact in double
    sums = [F.sum(F.floor(F.element_at(vec_col, i + 1).cast("double")
                          * F.lit(q))).alias(f"__s{i}")
            for i in range(dim)]
    g = df.groupBy(label_col).agg(F.count("*").alias("n_vecs"), *sums)
    centroid = F.array(*[
        F.col(f"__s{i}") / (F.col("n_vecs") * F.lit(q)) for i in range(dim)])
    return g.select(label_col, "n_vecs", centroid.alias("centroid"))


# ---------------------------------------------------------------------------
# Product quantization (r7): the memory-bound ANN compression step between
# SQ8 (scalar, 4x) and IVF (routing). A dim-D vector becomes m sub-codes of
# log2(ks) bits (here 4 x 4 bits = 2 BYTES per vector at D=64): the corpus
# scan that dominates large-scale retrieval reads ~100x less data, scored
# against a query via an additive lookup (ADC). Everything is INTEGER
# arithmetic on a fixed-point grid, so codebooks, codes, and ADC distances
# — not just their ranks — replay bit-identically in the SQL oracle.
# ---------------------------------------------------------------------------

PQ_SCALE = 16777216          # 2^24 fixed-point grid (the centroid grid)
PQ_OFFSET = PQ_SCALE         # +1.0 shift: components assumed in (-1, 1), so
#                              every fixed-point value is POSITIVE and the
#                              codebook's integer mean (sum div count) is
#                              floor on both engines (Spark div truncates
#                              toward zero, DuckDB // floors — they agree
#                              only on non-negative operands; audited by
#                              tests on the corpus range)


def _pq_components(df: DataFrame, id_col: str, vec_col: str, dsub: int,
                   out_id: str) -> DataFrame:
    """(id, sub, i, val): positive fixed-point components per subspace."""
    iv = F.transform(
        F.col(vec_col),
        lambda x: (F.floor(x.cast("double") * F.lit(float(PQ_SCALE)))
                   + F.lit(PQ_OFFSET)).cast("long"))
    return (df.select(F.col(id_col).alias(out_id),
                      F.posexplode(iv).alias("pos", "val"))
            .select(out_id,
                    F.floor(F.col("pos") / F.lit(dsub)).cast("int")
                    .alias("sub"),
                    F.pmod(F.col("pos"), F.lit(dsub)).cast("int").alias("i"),
                    "val"))


def _hadamard_components(df: DataFrame, id_col: str, vec_col: str,
                         dsub: int, out_id: str, dim: int) -> DataFrame:
    """(id, sub, i, val): Walsh-Hadamard-ROTATED positive fixed-point
    components — the OPQ-style structured rotation (H_dim has ±1
    entries, H[j][i] = (-1)^popcount(i & j)), kept fully integer:

      rot_j = Σ_i sign(i,j) · floor(x_i · 2^24)      (exact, |rot| ≤ 2^30)
      val_j = (rot_j + 2^30) div 8                   (≥ 0, < 2^28)

    The +2^30 shift makes the operand non-negative BEFORE the div-8
    normalization (1/8 = 1/sqrt(64) keeps the rotation orthonormal at
    the original scale), so truncating and flooring division agree —
    the PQ_OFFSET discipline. The div floor costs ≤ 1 unit on a 2^21-
    per-unit-x grid: ~1e-6 relative distance distortion, invisible to
    ranking (pinned vs the unrotated exact top-k in tests).

    Relational shape: explode-literal j (no join, no BNLJ) then one
    map-side-combined SUM on (id, j) — the O(d²) matmul bill, chosen
    because it replays verbatim in SQL. The O(d log d) butterfly FWHT
    is the production fast path at large d; at d = 64 the dense form
    is 4096 multiplies per row and the simpler plan wins.
    """
    raw = (df.select(
        F.col(id_col).alias(out_id),
        F.posexplode(F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(PQ_SCALE)))
            .cast("long"))).alias("pos", "rawval")))
    sign = F.when(F.expr("pmod(bit_count(pos & j), 2)") == 1,
                  -F.col("rawval")).otherwise(F.col("rawval"))
    rot = (raw.select(out_id, "pos", "rawval",
                      F.explode(F.lit(list(range(dim)))).alias("j"))
           .groupBy(out_id, "j").agg(F.sum(sign).alias("rot")))
    return (rot.select(out_id,
                       F.floor(F.col("j") / F.lit(dsub)).cast("int")
                       .alias("sub"),
                       F.pmod(F.col("j"), F.lit(dsub)).cast("int")
                       .alias("i"),
                       F.expr(f"(rot + {1 << 30}) div 8").alias("val")))


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5, m: int = 4,
            ks: int = 16, refine: int | None = None, id_col: str = "vec_id",
            vec_col: str = "embedding", rotate: str | None = None) -> DataFrame:
    """Top-k nearest neighbors by PQ asymmetric-distance shortlist +
    exact re-rank — the production retrieval shape (FAISS's
    IndexPQ + refine), fully integer and oracle-replayable.

    Pipeline (one pass each, no Python in the row path):
      1. codebook: stride-seeded ks centroids per subspace, one Lloyd
         step — integer L2 assignment (argmin with a (dist, seed_id)
         total order), then the component-wise INTEGER mean
         (sum div count, exact floor on the positive-shifted grid).
      2. encode: each corpus sub-vector -> id of its nearest centroid.
      3. ADC shortlist: the query's integer L2 to EVERY centroid (m·ks
         rows of metadata per query), summed over the corpus CODES —
         the corpus vectors are never rescanned — keeping the best
         ``refine`` (default 10·k) candidates per query.
      4. exact re-rank: integer fixed-point L2 on the shortlist only.

    Scale shape: training/encode cost is corpus x ks per subspace (the
    standard PQ bill); the scan that dominates at 100 TB reads 2-byte
    codes (m·log2(ks) bits), not float rows; exact distances touch
    refine vectors per query. On isotropic corpora (like the synthetic
    embeddings) ADC alone ranks poorly — distances concentrate and
    quantization noise swamps them — which is WHY the re-rank stage is
    part of the operator, not an afterthought; recall floors live in
    tests/test_ann_recall.py.
    Returns (query_id, neighbor_id, rank, dist BIGINT) — dist is the
    exact scaled squared-L2 (2^-24 grid); smaller = closer; ties break
    by ascending neighbor id. Self-matches excluded.

    ``rotate='hadamard'`` applies the deterministic Walsh-Hadamard
    rotation (see :func:`_hadamard_components`) to every vector before
    quantization — OPQ's energy-spreading idea with a FIXED orthogonal
    transform, so the whole pipeline (and its oracle) stays integer.
    Distances are then in the rotated space: same metric up to the
    orthonormal rescale + ~1e-6 floor distortion, pinned against the
    unrotated exact ranking in tests. Requires power-of-two dim.
    """
    if k < 1 or m < 1 or ks < 2:
        raise ValueError(f"bad params k={k} m={m} ks={ks}")
    refine = 10 * k if refine is None else refine
    if refine < k:
        raise ValueError(f"refine {refine} < k {k}")
    if rotate not in (None, "hadamard"):
        raise ValueError(f"unknown rotate={rotate!r}")
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if rotate == "hadamard" and dim & (dim - 1):
        raise ValueError(f"hadamard needs power-of-two dim, got {dim}")
    dsub = dim // m
    n_part = compute_parallelism(corpus.sparkSession)

    if rotate == "hadamard":
        def components(df, idc):
            return _hadamard_components(df, id_col, vec_col, dsub, idc, dim)
    else:
        def components(df, idc):
            return _pq_components(df, id_col, vec_col, dsub, idc)

    comp = pin(components(corpus.repartition(n_part, id_col), "cid"))
    # stride-seeded initial centroids: corpus vectors at every Nth id
    stride = _count_stride(corpus, ks)
    seed_ids = (corpus.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
                .orderBy(id_col).limit(ks).select(F.col(id_col).alias("sid")))
    seedc = (comp.join(F.broadcast(seed_ids),
                       comp["cid"] == seed_ids["sid"])
             .select("sid", "sub", "i", F.col("val").alias("sval")))

    def nearest(components: DataFrame, idc: str, cells: DataFrame,
                cell_id: str, cell_val: str) -> DataFrame:
        """argmin_{cell} sum_i (val - cell_val)^2 per (id, sub)."""
        d = (components.join(F.broadcast(cells), ["sub", "i"])
             .groupBy(idc, "sub", cell_id)
             .agg(F.sum((F.col("val") - F.col(cell_val))
                        * (F.col("val") - F.col(cell_val))).alias("d")))
        w = Window.partitionBy(idc, "sub").orderBy("d", cell_id)
        return (d.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1).drop("rn", "d"))

    assign0 = nearest(comp, "cid", seedc, "sid", "sval")
    # one Lloyd step: integer centroid = floor mean on the positive grid
    cent = (comp.join(assign0, ["cid", "sub"])
            .groupBy("sub", "sid", "i")
            .agg(F.expr("sum(val) div count(*)").alias("cval")))
    cent = pin(cent)
    codes = nearest(comp, "cid", cent, "sid", "cval")

    qcomp = components(queries, "qid")
    qd = (qcomp.join(F.broadcast(cent), ["sub", "i"])
          .groupBy("qid", "sub", "sid")
          .agg(F.sum((F.col("val") - F.col("cval"))
                     * (F.col("val") - F.col("cval"))).alias("qdist")))
    adc = (codes.join(F.broadcast(qd), ["sub", "sid"])
           .groupBy("qid", "cid")
           .agg(F.sum("qdist").cast("long").alias("adc"),
                F.count("*").alias("__m"))
           # a query missing a (sub, sid) cell cannot happen (qd covers
           # every cell), but guard the sum against partial joins anyway
           .filter(F.col("__m") == m)
           .filter(F.col("qid") != F.col("cid")))
    wa = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("cid"))
    shortlist = (adc.withColumn("arn", F.row_number().over(wa))
                 .filter(F.col("arn") <= refine).select("qid", "cid"))
    # exact re-rank on the shortlist only: integer fixed-point L2 over
    # the original components (refine · dim rows per query)
    exact = (shortlist
             .join(comp, "cid")
             .join(qcomp.select(F.col("qid"), "sub", "i",
                                F.col("val").alias("qval")),
                   ["qid", "sub", "i"])
             .groupBy("qid", "cid")
             .agg(F.sum((F.col("val") - F.col("qval"))
                        * (F.col("val") - F.col("qval")))
                  .cast("long").alias("dist")))
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("cid"))
    return (exact.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("cid").alias("neighbor_id"), "rank", "dist"))


# residual positive shift for IVF-PQ: component values live on [0, 2^25)
# (floor(x*2^24)+2^24 with x in (-1,1)), so val - cval is in (-2^25, 2^25)
# and adding 2^25 keeps every residual non-negative. The shift cancels in
# every DIFFERENCE (distances are shift-invariant) but keeps the Lloyd
# mean on the positive grid, where Spark's `div` (truncate) and DuckDB's
# `//` (floor) agree — the same trick PQ_OFFSET plays for raw components.
IVFPQ_RSHIFT = 2 * PQ_SCALE


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
               n_lists: int = 8, n_probe: int = 2, m: int = 4,
               ks: int = 16, refine: int | None = None,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ composition (FAISS ``IndexIVFPQ`` + refine, r7 future-work
    item): a coarse inverted-file quantizer routes vectors into lists,
    product quantization encodes the RESIDUAL to the list centroid, the
    query scans only its ``n_probe`` nearest lists via the ADC table on
    residual codes, and the shortlist is exactly re-ranked — the
    standard billion-scale retrieval shape, here fully integer and
    oracle-replayable.

    Pipeline:
      1. coarse codebook: stride-seeded ``n_lists`` centroids over the
         FULL fixed-point vector, one integer-Lloyd step (sum div count
         on the positive grid = exact floor on both engines), argmin
         assignment with a (dist, list_id) total order.
      2. residual components: val - cval + 2^25 per assigned list —
         non-negative by construction (see ``IVFPQ_RSHIFT``).
      3. residual PQ codebook: ONE codebook shared across lists (the
         FAISS default), stride-seeded ks centroids per subspace, one
         integer-Lloyd step, corpus residuals -> m sub-codes.
      4. query: probe the ``n_probe`` nearest coarse lists; per probed
         list, form the query residual and the (list, sub, sid) ADC
         table (m·ks·n_probe integer cells per query — metadata);
         candidates are corpus codes in probed lists only, summed over
         codes, never rescanning vectors.
      5. exact integer-L2 re-rank of the best ``refine`` (default 10·k)
         candidates per query on the ORIGINAL components.

    Scale shape: the coarse+PQ training is the standard IVF-PQ bill
    (corpus × n_lists + corpus × ks per subspace, all equi-joins against
    broadcast centroid relations); the query-time scan touches
    n_probe/n_lists of the CODES (2 bytes/vector at m=4, ks=16) and the
    exact stage touches ``refine`` vectors per query. Every join is an
    equi-join; the only ``collect()`` is none — centroids stay
    DataFrames joined by broadcast. Approximate by design, but the
    deterministic seeding + integer arithmetic make the whole run replay
    bit-identically in SQL; recall floors live in
    tests/test_ann_recall.py.

    Returns (query_id, neighbor_id, rank, dist BIGINT): dist is the
    exact scaled squared-L2 on the 2^-24 grid; ties break by ascending
    neighbor id; self-matches excluded.
    """
    if k < 1 or m < 1 or ks < 2 or n_lists < 2 or n_probe < 1:
        raise ValueError(
            f"bad params k={k} m={m} ks={ks} n_lists={n_lists} "
            f"n_probe={n_probe}")
    if n_probe > n_lists:
        raise ValueError(f"n_probe {n_probe} > n_lists {n_lists}")
    refine = 10 * k if refine is None else refine
    if refine < k:
        raise ValueError(f"refine {refine} < k {k}")
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    n_part = compute_parallelism(corpus.sparkSession)

    # full-dim integer components, one shared scan (coarse stage treats
    # the whole vector as a single subspace: sub=0, i=position).
    # r12: the five stage intermediates below are EAGER localCheckpoints
    # instead of pin() — each stage re-reads the previous from 2–3 join
    # sides, so the lazily-pinned lineage compounded into a 435 KB /
    # 290-Exchange plan whose Catalyst canonicalization dominated;
    # checkpointing truncates it (measured faster in alternating A/B,
    # the unigram-EM / graph-loop finding applied here)
    comp0 = _pq_components(corpus.repartition(n_part, id_col),
                           id_col, vec_col, dim, "cid").transform(ckpt)

    def argmin(components: DataFrame, idc: str, cells: DataFrame,
               cell_id: str, cell_val: str) -> DataFrame:
        """argmin_{cell} sum_i (val - cell_val)^2 per (id, sub) with the
        (dist, cell_id) total order — deterministic on ties."""
        d = (components.join(F.broadcast(cells), ["sub", "i"])
             .groupBy(idc, "sub", cell_id)
             .agg(F.sum((F.col("val") - F.col(cell_val))
                        * (F.col("val") - F.col(cell_val))).alias("d")))
        w = Window.partitionBy(idc, "sub").orderBy("d", cell_id)
        return (d.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1).drop("rn", "d"))

    # ---- stage 1: coarse codebook + corpus list assignment ----------
    stride_c = _count_stride(corpus, n_lists)
    cseed_ids = (corpus
                 .filter(F.pmod(F.col(id_col), F.lit(stride_c)) == 0)
                 .limit(n_lists).select(F.col(id_col).alias("list_id")))
    cseedc = (comp0.join(F.broadcast(cseed_ids),
                         comp0["cid"] == cseed_ids["list_id"])
              .select("list_id", "sub", "i", F.col("val").alias("sval")))
    ca0 = argmin(comp0, "cid", cseedc, "list_id", "sval")
    ccent = (comp0.join(ca0.select("cid", "list_id"), "cid")
             .groupBy("list_id", "sub", "i")
             .agg(F.expr("sum(val) div count(*)").alias("cval"))
             .transform(ckpt))
    cassign = (argmin(comp0, "cid", ccent, "list_id", "cval")
               .select("cid", "list_id").transform(ckpt))

    # ---- stage 2: positive-shifted residuals, split into subspaces --
    rcomp = (
        comp0.join(cassign, "cid")
        .join(F.broadcast(ccent.select("list_id", "i", "cval")),
              ["list_id", "i"])
        .select("cid", "list_id",
                F.floor(F.col("i") / F.lit(dsub)).cast("int").alias("rsub"),
                F.pmod(F.col("i"), F.lit(dsub)).cast("int").alias("ri"),
                (F.col("val") - F.col("cval")
                 + F.lit(IVFPQ_RSHIFT)).alias("rval"))
        .select("cid", "list_id", F.col("rsub").alias("sub"),
                F.col("ri").alias("i"), F.col("rval").alias("val"))
        .transform(ckpt))

    # ---- stage 3: shared residual PQ codebook + corpus codes --------
    stride_r = _count_stride(corpus, ks)
    rseed_ids = (corpus
                 .filter(F.pmod(F.col(id_col), F.lit(stride_r)) == 0)
                 .limit(ks).select(F.col(id_col).alias("sid")))
    rseedc = (rcomp.join(F.broadcast(rseed_ids),
                         rcomp["cid"] == rseed_ids["sid"])
              .select("sid", "sub", "i", F.col("val").alias("sval")))
    ra0 = argmin(rcomp, "cid", rseedc, "sid", "sval")
    rcent = (rcomp.join(ra0, ["cid", "sub"])
             .groupBy("sub", "sid", "i")
             .agg(F.expr("sum(val) div count(*)").alias("rcval"))
             .transform(ckpt))
    rcodes = argmin(rcomp, "cid",
                    rcent.select("sub", "sid", "i",
                                 F.col("rcval").alias("cval")),
                    "sid", "cval")

    # ---- stage 4: query probes + ADC over codes ---------------------
    qcomp = _pq_components(queries, id_col, vec_col, dim, "qid")
    qcd = (qcomp.join(F.broadcast(ccent), ["sub", "i"])
           .groupBy("qid", "list_id")
           .agg(F.sum((F.col("val") - F.col("cval"))
                      * (F.col("val") - F.col("cval"))).alias("d")))
    wq = Window.partitionBy("qid").orderBy("d", "list_id")
    qlists = (qcd.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= n_probe).select("qid", "list_id"))
    # query residual per probed list, then the ADC table: the integer L2
    # from the query residual to EVERY residual centroid, per list —
    # n_probe·m·ks cells per query, metadata-sized, broadcast below
    qrcomp = (qcomp.join(F.broadcast(qlists), "qid")
              .join(F.broadcast(ccent.select("list_id", "i", "cval")),
                    ["list_id", "i"])
              .select("qid", "list_id",
                      F.floor(F.col("i") / F.lit(dsub)).cast("int")
                      .alias("rsub"),
                      F.pmod(F.col("i"), F.lit(dsub)).cast("int")
                      .alias("ri"),
                      (F.col("val") - F.col("cval")
                       + F.lit(IVFPQ_RSHIFT)).alias("qrval")))
    qd = (qrcomp.join(F.broadcast(rcent),
                      (F.col("rsub") == rcent["sub"])
                      & (F.col("ri") == rcent["i"]))
          .groupBy("qid", "list_id", "sub", "sid")
          .agg(F.sum((F.col("qrval") - F.col("rcval"))
                     * (F.col("qrval") - F.col("rcval"))).alias("qdist")))
    adc = (rcodes.join(cassign, "cid")
           .join(F.broadcast(qd), ["list_id", "sub", "sid"])
           .groupBy("qid", "cid")
           .agg(F.sum("qdist").cast("long").alias("adc"),
                F.count("*").alias("__m"))
           .filter(F.col("__m") == m)
           .filter(F.col("qid") != F.col("cid")))
    wa = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("cid"))
    shortlist = (adc.withColumn("arn", F.row_number().over(wa))
                 .filter(F.col("arn") <= refine).select("qid", "cid"))

    # ---- stage 5: exact integer re-rank on the shortlist ------------
    exact = (shortlist
             .join(comp0, "cid")
             .join(qcomp.select("qid", "sub", "i",
                                F.col("val").alias("qval")),
                   ["qid", "sub", "i"])
             .groupBy("qid", "cid")
             .agg(F.sum((F.col("val") - F.col("qval"))
                        * (F.col("val") - F.col("qval")))
                  .cast("long").alias("dist")))
    w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("cid"))
    return (exact.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .select(F.col("qid").alias("query_id"),
                    F.col("cid").alias("neighbor_id"), "rank", "dist"))


def matryoshka_overlap(corpus: DataFrame, queries: DataFrame, k: int = 5,
                       prefix_dim: int = 16, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Matryoshka (MRL) truncation evaluation: how much of the FULL-
    vector exact top-k does the ``prefix_dim``-truncated embedding
    retrieve? The operational question behind shipping truncated MRL
    embeddings — answer it on YOUR corpus before cutting storage 4×.

    Both rankings are exact integer fixed-point L2 with the (dist, id)
    total order; the truncated ranking simply drops components at
    index >= prefix_dim (the positive shift cancels in differences, so
    truncation is a filter, not a re-encode). Scoring goes through the
    exploded-components equi-join on the position index (the PQ
    re-rank shape — no BNLJ, no cartesian): corpus × dim rows join the
    broadcast query components, one hash agg per (query, candidate).

    Returns (query_id, n_overlap BIGINT) with n_overlap in [0, k]:
    |top-k(full) ∩ top-k(prefix)| per query.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    dim = len(corpus.select(vec_col).first()[0])
    if not (0 < prefix_dim <= dim):
        raise ValueError(f"prefix_dim {prefix_dim} not in 1..{dim}")
    comp = pin(_pq_components(corpus, id_col, vec_col, dim, "cid"))
    qcomp = pin(_pq_components(queries, id_col, vec_col, dim, "qid"))

    def topk(limit_dim: int) -> DataFrame:
        c = comp.filter(F.col("i") < limit_dim) if limit_dim < dim else comp
        q = qcomp.filter(F.col("i") < limit_dim) if limit_dim < dim \
            else qcomp
        d = (c.join(F.broadcast(q.select("qid", "i",
                                         F.col("val").alias("qval"))), "i")
             .filter(F.col("cid") != F.col("qid"))
             .groupBy("qid", "cid")
             .agg(F.sum((F.col("val") - F.col("qval"))
                        * (F.col("val") - F.col("qval")))
                  .cast("long").alias("dist")))
        w = Window.partitionBy("qid").orderBy(F.asc("dist"), F.asc("cid"))
        return (d.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k).select("qid", "cid"))

    full, pref = topk(dim), topk(prefix_dim)
    return (full.join(pref, ["qid", "cid"], "left_semi")
            .groupBy("qid").agg(F.count("*").alias("__o"))
            .join(full.select("qid").distinct(), "qid", "right")
            .select(F.col("qid").alias("query_id"),
                    F.coalesce(F.col("__o"), F.lit(0)).cast("long")
                    .alias("n_overlap")))


def learned_ivf_params(n: int, max_lists: int = 1024) -> tuple[int, int]:
    """Choose (n_lists, n_probe) from the corpus size — the "learned"
    IVF configuration rule (r8, from the recorded ANN_CURVES.json
    sweep): n_lists = the largest power of two <= floor(sqrt(n))
    (capped), n_probe = n_lists/4.

    Why sqrt: expected list length n/n_lists and the number of
    centroid comparisons n_lists are balanced at sqrt(n) — the
    standard IVF sizing rule (FAISS docs use 4*sqrt(n)..16*sqrt(n) for
    trained indexes; the untrained stride seeds here sit at the
    conservative end). Why probe/lists = 1/4: the recorded curves show
    recall is governed by the probed FRACTION (16/4 lists -> 0.48,
    16/8 -> 0.744 at sf0.1), so the ratio — not an absolute probe
    count — is what transfers across corpus sizes.

    Powers of two + integer isqrt keep the rule bit-replayable in SQL
    (a CASE ladder over floor(sqrt(count))) — no float log2 at a
    boundary. ``max_lists`` bounds the seed collect (metadata scale);
    corpora past max_lists^2 want trained k-means centroids instead.
    """
    import math

    if n < 1:
        raise ValueError(f"corpus must be non-empty, got {n}")
    s = math.isqrt(n)
    nl = 1
    while nl * 2 <= s and nl * 2 <= max_lists:
        nl *= 2
    return nl, max(1, nl // 4)


def ivf_topk_learned(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     max_lists: int = 1024,
                     score_decimals: int = 4) -> DataFrame:
    """:func:`ivf_topk` with (n_lists, n_probe) derived from the corpus
    count by :func:`learned_ivf_params` instead of hand-tuned — the
    closed README roadmap item "learned IVF list counts from corpus
    stats". The count is one metadata-scale job (same class as
    _count_stride's); everything downstream is the audited ivf_topk
    plan (bucketed equi-joins, n_lists-bounded collects, no BNLJ)."""
    n = corpus.count()
    n_lists, n_probe = learned_ivf_params(n, max_lists)
    return ivf_topk(corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
                    n_lists=n_lists, n_probe=n_probe,
                    score_decimals=score_decimals)


def ivf_assign(vecs: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign vectors to FROZEN centroids (r11) — the index-MAINTENANCE
    half of IVF: production ANN systems retrain centroids rarely
    (:func:`kmeans_refine`, offline) and assign continuously; a new
    batch lands in the existing lists with one Arrow-vectorized map —
    no retraining, no shuffle, no index rebuild. Argmax cosine with
    ties by ascending list_id (the `_top_lists_udf` convention the
    certified IVF gates already rely on).

    ``centroids`` is (list_id, centroid) — metadata-sized by
    construction (n_lists rows), collected once and broadcast inside
    the UDF closure. Returns (id_col, list_id)."""
    cent = {int(r["list_id"]): [float(x) for x in r["centroid"]]
            for r in centroids.collect()}   # metadata collect: n_lists rows
    if not cent:
        raise ValueError("ivf_assign needs a non-empty centroid table")
    ids = sorted(cent)
    nearest = _top_lists_udf(ids, [cent[i] for i in ids], keep=1)
    v = vecs.select(F.col(id_col),
                    F.transform(F.col(vec_col),
                                lambda x: x.cast("double")).alias("__v"))
    return v.select(id_col, F.explode(nearest(F.col("__v")))
                    .alias("list_id"))
