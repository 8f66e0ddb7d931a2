"""Sketch-accelerated exact operators.

The production pattern: a per-partition sketch proposes a small candidate
set with a coverage guarantee, then one exact pass over candidates only
produces the EXACT answer — so the result is deterministic and fully
oracle-checkable even though a sketch did the heavy lifting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bqetl_spark.functions.text import tokens


def heavy_hitter_tokens(df: DataFrame, text_col: str = "text",
                        k: int = 50) -> DataFrame:
    """Exact tokens with frequency strictly greater than total_tokens/k,
    via per-partition Misra-Gries candidates + exact recount.

    Why not a plain groupBy: at 100 TB the token groupBy shuffles one
    record per DISTINCT token (billions); Misra-Gries holds at most k
    counters per partition, so the candidate set that crosses the wire is
    ≤ k·partitions rows, and the exact recount semi-joins the stream down
    to those candidates before aggregating.

    Coverage proof (why the result is exact, not approximate): a token
    with global freq > n/k has freq_p > n_p/k in at least one partition
    (pigeonhole over Σn_p = n), and Misra-Gries with capacity k retains
    any token with partition frequency > n_p/(k+1) — so every true heavy
    hitter is a candidate; the recount then computes exact counts and the
    threshold filter discards false candidates. Python touches only
    per-batch VALUE COUNTS (pandas value_counts is vectorized); the
    decrement step runs once per Arrow batch, not per row.

    Returns (tok, n_occurrences) — exact, deterministic, SQL-oracle-able.
    """
    toks = (df.filter(F.trim(F.col(text_col)) != "")
            .select(F.explode(tokens(F.col(text_col))).alias("tok")))
    total = toks.count()

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for t, c in pdf["tok"].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > k:
                # subtract the (k+1)-th largest from everyone; drop <= 0.
                # decrement mass per surviving token <= n_p/(k+1) total,
                # preserving the Misra-Gries retention guarantee.
                cut = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - cut for t, c in counters.items()
                            if c - cut > 0}
        yield pd.DataFrame({"tok": list(counters.keys())})

    cands = toks.mapInPandas(mg, "tok string").distinct()
    return (toks.join(F.broadcast(cands), "tok")
            .groupBy("tok")
            .agg(F.count("*").alias("n_occurrences"))
            .filter(F.col("n_occurrences") * k > F.lit(total)))


def kmv_hash(col) -> "F.Column":
    """The 60-bit uniform hash KMV sorts on: first 15 hex digits of md5,
    parsed as an integer. md5 is available bit-identically in every engine
    (unlike xxhash64), which is what makes the sketch's ESTIMATE — not just
    an error bound — reproducible in a SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, value_col: str, group_col: str,
                 k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count sketch per group — the bounded-state
    answer to COUNT(DISTINCT) at corpus scale, with a deterministic
    estimate.

    Why not count_distinct: exact distinct shuffles one row per DISTINCT
    value (billions of tokens at 100 TB). KMV keeps only the k smallest
    hash values per group: uniform hashes' k-th order statistic at
    fraction f of the hash space implies ≈ (k-1)/f distinct values. State
    is O(groups·k) per partition; what crosses the wire is ≤ k·partitions
    rows per group, never the value set.

    Two-phase shape (mirrors ``heavy_hitter_tokens``): a mapInPandas
    partial pass keeps the per-partition k smallest distinct hashes per
    group (bounded memory, Arrow-vectorized nsmallest), then ONE groupBy
    merges candidate lists and takes the global k smallest. When a group
    has fewer than k distinct hashes the sketch degenerates to the EXACT
    distinct count (every hash is a candidate), so small groups pay no
    error.

    Estimate arithmetic is chosen for cross-engine bit-equality: hashes
    are 60-bit integers (``kmv_hash``), and (k-1)·2^60 is exactly
    representable in an IEEE double (mantissa k-1 ≤ 2^53, trailing zero
    bits), so ``floor((k-1)·2^60 / kth)`` is one correctly-rounded IEEE
    division + floor — identical in Spark and DuckDB. Returns
    (group_col, est_distinct BIGINT, kth_hash BIGINT).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return kmv_estimate(kmv_sketch(df, value_col, group_col, k),
                        group_col, k)


def kmv_sketch(df: DataFrame, value_col: str, group_col: str,
               k: int = 256) -> DataFrame:
    """The persistable sketch itself: (grp, mins array<long>) - what a
    daily pipeline WRITES so tomorrow's run can ``kmv_merge`` instead of
    re-scanning history. Bounded state: a mapInPandas partial pass keeps
    the per-partition k smallest distinct hashes per group (trimmed at
    4k), then ONE groupBy merges candidate lists; the group key travels
    as a string through the Arrow pass.

    NULL semantics: NULL group keys are kept (a real group, matching the
    merging groupBy and SQL GROUP BY); NULL values are dropped before the
    Arrow pass (COUNT(DISTINCT) ignores NULLs) — which also keeps the hv
    column int64 end-to-end (a NULL hash would coerce the Arrow batch to
    float64 and lose precision on 60-bit hashes)."""
    hashes = (df.select(F.col(group_col).cast("string").alias("grp"),
                        kmv_hash(value_col).alias("hv"))
              .filter(F.col("hv").isNotNull()))

    def partial(batches):
        import pandas as pd

        state: dict = {}
        for pdf in batches:
            # dropna=False: pandas' default silently drops NULL group keys,
            # which the merging groupBy (and the oracle) keep
            for g, sub in pdf.groupby("grp", dropna=False)["hv"]:
                key = None if pd.isna(g) else g
                st = state.setdefault(key, set())
                st.update(sub.unique().tolist())
                if len(st) > 4 * k:
                    state[key] = set(sorted(st)[:k])
        rows = [(g, hv) for g, st in state.items() for hv in sorted(st)[:k]]
        yield pd.DataFrame(rows, columns=["grp", "hv"])

    cands = hashes.mapInPandas(partial, "grp string, hv long")
    return (cands.groupBy("grp")
            .agg(F.slice(F.array_sort(F.collect_set("hv")), 1, k)
                 .alias("mins")))


def sampled_quantiles(df: DataFrame, value_col: str, id_expr,
                      qs: tuple[float, ...] = (0.5, 0.95, 0.99),
                      k: int = 1024) -> DataFrame:
    """Bounded-state quantile estimation with a DETERMINISTIC,
    SQL-replayable answer — the third sketch alongside ``kmv_distinct``
    and ``heavy_hitter_tokens``.

    The sample is the k rows with the smallest ``kmv_hash(id)`` — a
    uniform sample that is a pure function of the data (no RNG state), so
    the same rows are chosen on any engine, partitioning or cluster size.
    ORDER BY hash LIMIT k is Spark's TakeOrdered: each partition ships at
    most its own k smallest rows, never the column. The estimate is the
    lower quantile of the sample (rank floor(q·(n−1))+1, ties broken by
    the hash) — all-integer rank arithmetic after one IEEE multiply, so
    the oracle reproduces the VALUE, not an error band. Sampling error is
    the usual O(1/sqrt(k)) on the quantile's CDF position.

    ``id_expr``: column/expression uniquely identifying a row (hash
    collisions merely drop one row from the sample). Returns
    (q DOUBLE, value, n_sample BIGINT).
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0,1], got {qs}")
    sample = (df.select(F.col(value_col).alias("v"),
                        kmv_hash(id_expr).alias("hv"))
              .orderBy("hv").limit(k))
    # Unpartitioned Window BELOW THE .limit(k): Spark logs "No Partition
    # Defined ... may cause serious performance degradation", but the
    # input here is the k-row sample (k <= ~1024), never the data — a
    # single-partition rank over a bounded sample is the POINT of the
    # sketch. Boundedness is pinned by tests/test_sketch_kmv.py
    # (test_quantile_window_input_is_bounded). At 100 TB the heavy work
    # is the TakeOrdered(k) above, which is distributed.
    w = Window.orderBy("v", "hv")
    ranked = (sample
              .select("v", F.row_number().over(w).alias("rv"),
                      F.count("*").over(
                          Window.rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing))
                      .alias("n")))
    targets = F.array(*[F.struct(F.lit(float(q)).alias("q"),
                                 (F.floor(F.lit(float(q)) * (F.col("n") - 1))
                                  + 1).alias("rq")) for q in qs])
    return (ranked
            .select("v", "rv", F.col("n").alias("n_sample"),
                    F.explode(targets).alias("t"))
            .filter(F.col("rv") == F.col("t.rq"))
            .select(F.col("t.q").alias("q"), F.col("v").alias("value"),
                    "n_sample"))


def percentile_band_filter(df: DataFrame, value_col: str, id_expr,
                           lo: float = 0.05, hi: float = 0.95,
                           k: int = 1024) -> DataFrame:
    """Keep rows whose ``value_col`` lies within the [lo, hi] percentile
    band — tail pruning (drop the shortest/longest, lowest/highest-score
    documents), the standard quality-distribution trim before training.

    Scale-correct composition: the thresholds come from
    :func:`sampled_quantiles` (deterministic k-smallest-md5 sample +
    integer rank arithmetic), NOT a global sort — percent_rank over the
    corpus would be a single-partition window. The two threshold values
    are a metadata-sized collect (same audit class as the IVF centroid
    collects); the filter itself is a row-local scan predicate that
    pushes down to the parquet reader. Below ~k rows the sample is the
    whole corpus and the band is exact; beyond, thresholds carry the
    sketch's O(1/sqrt(k)) CDF error — deterministically, so the result
    is still value-oracle-able.

    Inclusive on both ends; NULL values never match (SQL comparison
    semantics).
    """
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got {lo}, {hi}")
    thresholds = {float(r["q"]): r["value"] for r in
                  sampled_quantiles(df, value_col, id_expr,
                                    qs=(lo, hi), k=k).collect()}
    if not thresholds:  # empty input
        return df.filter(F.lit(False))
    return df.filter((F.col(value_col) >= F.lit(thresholds[lo]))
                     & (F.col(value_col) <= F.lit(thresholds[hi])))


def winsorize(df: DataFrame, value_col: str, id_expr,
              lo: float = 0.05, hi: float = 0.95, k: int = 1024,
              out_col: str | None = None) -> DataFrame:
    """Cap instead of drop: values below the lo-percentile threshold are
    raised to it and values above the hi-threshold lowered to it —
    winsorization, the tail treatment for score/reward columns where
    dropping rows (:func:`percentile_band_filter`) would bias the mix.
    Row count is preserved; NULLs pass through as NULL.

    Same scale-correct composition as the band filter: thresholds come
    from the deterministic quantile sketch (never a global sort), the
    two threshold values are a metadata-sized collect, and the capping
    itself is a row-local projection — one map stage at 100 TB.
    Appends ``out_col`` (default ``<value_col>_w``); empty input yields
    the input unchanged with a NULL capped column.
    """
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError(f"need 0 <= lo <= hi <= 1, got {lo}, {hi}")
    out_col = out_col or f"{value_col}_w"
    thresholds = {float(r["q"]): r["value"] for r in
                  sampled_quantiles(df, value_col, id_expr,
                                    qs=(lo, hi), k=k).collect()}
    if not thresholds:
        return df.withColumn(out_col, F.lit(None).cast(
            df.schema[value_col].dataType))
    v = F.col(value_col)
    capped = (F.when(v < F.lit(thresholds[lo]), F.lit(thresholds[lo]))
              .when(v > F.lit(thresholds[hi]), F.lit(thresholds[hi]))
              .otherwise(v))
    return df.withColumn(out_col, capped)


def kmv_merge(*sketches: DataFrame, k: int = 256) -> DataFrame:
    """Merge KMV candidate tables — the property that makes the sketch
    production-useful: yesterday's corpus sketch + today's batch sketch
    gives the union's distinct estimate WITHOUT re-scanning the corpus.

    Input: (grp, mins array<long>) frames as produced inside
    ``kmv_distinct`` (its merged candidate shape); output has the same
    schema. Lossless: the k smallest of a union is computable from each
    side's k smallest — so merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)
    exactly, which the incremental gate pins against the full-corpus
    oracle.

    PRECONDITION (k-consistency): the identity above requires the merge
    ``k`` to be ≤ every input sketch's k. Merging k=128 sketches at the
    default k=256 yields mins arrays shorter than k for groups that were
    truncated at build time, and ``kmv_estimate`` would then take its
    exact-count path (size < k) and silently return the truncated 128
    instead of an estimate. Build and merge with the same k."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.select("grp", F.explode("mins").alias("hv"))
            .groupBy("grp")
            .agg(F.slice(F.array_sort(F.collect_set("hv")), 1, k)
                 .alias("mins")))


def kmv_estimate(merged: DataFrame, group_col: str, k: int) -> DataFrame:
    """(grp, mins) → the estimate row, same arithmetic as kmv_distinct."""
    span = float(16 ** 15)
    kth = F.element_at("mins", k)
    return merged.select(
        F.col("grp").alias(group_col),
        F.when(F.size("mins") < k, F.size("mins").cast("long"))
         .otherwise(F.floor(F.lit((k - 1) * span) / kth))
         .alias("est_distinct"),
        F.when(F.size("mins") < k, F.lit(None).cast("long"))
         .otherwise(kth).alias("kth_hash"))


def cms_sketch(df: DataFrame, value_col, width: int = 256,
               depth: int = 4) -> DataFrame:
    """Count-min sketch of ``value_col`` occurrences (r7): a
    depth×width counter grid where row d counts values at column
    h_d(v) = md5-derived-int('d:' || v) mod width. The classic
    mergeable frequency summary — estimates are upper bounds with error
    <= N·e/width at confidence 1-e^-depth, counters ADD under union
    (sums commute), and the md5 hash family makes the grid — and thus
    the ESTIMATES, not just their bounds — bit-replayable in a SQL
    oracle (same treatment as the KMV sketch).

    Scale shape: one explode (depth rows per value row, depth is 4) +
    one map-side-combined sum aggregation on (d, idx); the sketch is
    depth·width rows of state TOTAL, independent of data size. Returns
    (d INT, idx INT, cnt BIGINT), only non-zero cells.
    """
    if width < 1 or depth < 1:
        raise ValueError(f"width/depth must be >= 1, got {width}/{depth}")
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    rows = df.select(c.cast("string").alias("__v")).filter(
        F.col("__v").isNotNull())
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    hv = F.conv(F.substring(F.md5(F.concat_ws(":", F.col("d").cast("string"),
                                              F.col("__v"))), 1, 15),
                16, 10).cast("long")
    return (rows.select("__v", d)
            .select(F.col("d").cast("int").alias("d"),
                    F.pmod(hv, F.lit(width)).cast("int").alias("idx"))
            .groupBy("d", "idx")
            .agg(F.count("*").cast("long").alias("cnt")))


def _cms_guarded(sketch: DataFrame, width: int, depth: int) -> DataFrame:
    """Lazy cell-range validation (ADVICE r7: estimate/merge took
    width/depth on faith while bloom_might_contain validates m_bits): a
    sketch cell outside [0,width)×[0,depth) means the probe/merge was
    given sketches built with DIFFERENT parameters, which silently
    under-estimates (cells never match the probe's hash positions).
    Pure Catalyst — assert_true rides the value path, map-only, no
    extra job; it fires during whatever action consumes the result."""
    ok = ((F.col("idx") >= 0) & (F.col("idx") < width)
          & (F.col("d") >= 0) & (F.col("d") < depth))
    guard = F.assert_true(ok, F.concat(
        F.lit(f"cms cell (d,idx)=("), F.col("d"), F.lit(","),
        F.col("idx"),
        F.lit(f") outside width={width} depth={depth} — the sketch was "
              f"built with different parameters")))
    # .otherwise(NULL) keeps the branches distinct so Catalyst's
    # SimplifyConditionals cannot collapse the when() and prune the
    # assert; the otherwise value is unreachable (a failing condition
    # raises while evaluating the guard itself).
    return sketch.select(
        "d", "idx",
        F.when(guard.isNull(), F.col("cnt"))
        .otherwise(F.lit(None).cast("long")).alias("cnt"))


def cms_merge(*sketches: DataFrame, width: int | None = None,
              depth: int | None = None) -> DataFrame:
    """Union count-min sketches built with the SAME (width, depth):
    counters add cell-wise — the mergeability that lets per-shard /
    per-day sketches roll up without rescanning anything. Pass
    ``width``/``depth`` to assert every input's cells are in range
    (catches a mixed-parameter merge at execution time instead of
    silently producing a wrong grid)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    if (width is None) != (depth is None):
        raise ValueError(
            "cms_merge: pass BOTH width and depth (or neither) — a "
            "half-specified grid cannot be range-validated")
    if width is not None and depth is not None:
        sketches = tuple(_cms_guarded(s, width, depth) for s in sketches)
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return (u.groupBy("d", "idx")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def cms_estimate(sketch: DataFrame, values, width: int = 256,
                 depth: int = 4) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each query
    value, min over rows d of counter[d][h_d(v)] (absent cell = 0).
    ``values`` is a small literal list (the query side is metadata);
    returns (value STRING, est BIGINT). est >= true count always;
    over-estimation comes only from cell collisions. Sketch cells are
    range-validated against (width, depth) lazily during the probe —
    see _cms_guarded."""
    sketch = _cms_guarded(sketch, width, depth)
    spark = sketch.sparkSession
    q = spark.createDataFrame([(str(v),) for v in values], "value string")
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    hv = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("d").cast("string"), F.col("value"))), 1, 15),
        16, 10).cast("long")
    cells = (q.select("value", d)
             .select("value", F.col("d").cast("int").alias("d"),
                     F.pmod(hv, F.lit(width)).cast("int").alias("idx")))
    return (cells.join(sketch, ["d", "idx"], "left")
            .groupBy("value")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("long").alias("est")))


# ---------------------------------------------------------------------------
# HyperLogLog (r7): the canonical mergeable cardinality sketch.
#
# KMV (above) answers distinct-count with k 64-bit mins per group; HLL
# answers it with m = 2^p SMALL integer registers (max leading-run
# lengths), the state shape every warehouse exposes as approx_count_
# distinct. We keep the hash family md5-derived so the registers — and
# the ESTIMATE arithmetic — replay bit-identically in a SQL oracle:
# one 60-bit hash per value, top HLL_P bits pick the register, the
# leading-zero run of the remaining HLL_W bits (via length(bin(x)),
# identical minimal-length semantics in Spark and DuckDB) sets rho.
# Registers MAX under union, so per-shard / per-day sketches fold into
# a stored 256-row table without rescanning history (same mergeability
# contract as kmv_merge, pinned in tests).
# ---------------------------------------------------------------------------

HLL_P = 8                     # register-index bits
HLL_M = 1 << HLL_P            # 256 registers
HLL_W = 60 - HLL_P            # 52 rho bits (md5 prefix gives 60)
HLL_RHO_MAX = HLL_W + 1       # rho when the 52 rho bits are all zero
# floor(1e6 * 0.7213 / (1 + 1.079/m)) — the standard bias constant,
# integerized once here and embedded verbatim in the oracle SQL.
HLL_ALPHA_PPM = 718272
# alpha_ppm * m^2 * 2^HLL_RHO_MAX: the raw-estimate numerator as one
# exact integer constant (DECIMAL(38,0) / HUGEINT on the two engines).
HLL_RAW_NUM = HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << HLL_RHO_MAX)

# HLL++ empirical bias-correction table (Heule et al., EDBT'13 §5.2):
# (mean raw estimate, mean raw - true n) anchors through the correction
# zone raw <= 5m = 1280, calibrated for THIS hash family / integer
# estimate by tools/calibrate_hll_bias.py (1000 deterministic md5
# streams per anchor; Google's published 200-point tables target their
# 64-bit hash and are not reproducible offline — same method, our
# parameters). Trailing all-zero anchors trimmed: bias is 0 from
# raw >= 1025 on. LITERAL constants — the Spark expression and the
# DuckDB oracle CASE ladder are both generated from this one table, so
# the piecewise-linear interpolation replays bit-identically.
HLL_BIAS_TABLE = (
    (528, 28), (550, 25), (573, 23), (595, 20),
    (618, 18), (642, 17), (664, 14), (687, 12),
    (710, 10), (734, 9), (758, 8), (782, 7),
    (806, 6), (831, 6), (854, 4), (879, 4),
    (903, 3), (927, 2), (951, 1), (976, 1),
    (1001, 1), (1025, 0),
)


def hll_sketch(df: DataFrame, value_col, group_col: str | None = None
               ) -> DataFrame:
    """Per-group HyperLogLog registers for ``value_col``.

    Returns (grp?, bucket INT, max_rho INT) — only non-empty registers,
    at most HLL_M rows per group regardless of data size. One shuffle:
    the map-side-combined MAX aggregation on (grp, bucket).
    """
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = [group_col] if group_col else []
    rows = (df.select(*keys, c.cast("string").alias("__v"))
            .filter(F.col("__v").isNotNull()))
    hv = F.conv(F.substring(F.md5(F.col("__v")), 1, 15), 16, 10).cast("long")
    bucket = F.shiftright(hv, HLL_W).cast("int").alias("bucket")
    rest = hv.bitwiseAND(F.lit((1 << HLL_W) - 1))
    # leading-zero run length + 1 over the HLL_W-bit field: bin() prints
    # the minimal binary form in BOTH engines, so bitlen = length(bin(x))
    # and rho = W - bitlen + 1; the all-zero field gets rho = W + 1.
    rho = (F.when(rest == 0, F.lit(HLL_RHO_MAX))
           .otherwise(F.lit(HLL_W + 1) - F.length(F.bin(rest)))
           .cast("int"))
    return (rows.select(*keys, bucket, rho.alias("rho"))
            .groupBy(*keys, "bucket")
            .agg(F.max("rho").cast("int").alias("max_rho")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union HLL sketches built with the same precision: registers MAX
    cell-wise (max commutes), so merge(sketch(A), sketch(B)) ≡
    sketch(A ∪ B) exactly — pinned against the plain full-corpus sketch
    in tests. Works on dense (``bucket``) and HLL++ sparse (``idx``)
    sketches alike; do not mix the two in one merge (downconvert the
    sparse side first)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    idx_col = "idx" if "idx" in u.columns else "bucket"
    keys = [c for c in u.columns if c not in (idx_col, "max_rho")]
    return (u.groupBy(*keys, idx_col)
            .agg(F.max("max_rho").cast("int").alias("max_rho")))


def hll_estimate(registers: DataFrame, group_col: str | None = None
                 ) -> DataFrame:
    """Distinct-count estimates from HLL registers, integer-exact.

    raw  = floor(alpha_ppm·m²·2^R / (10^6·S)) with
           S = (m−V)·2^R + Σ_buckets 2^(R−max_rho), R = HLL_RHO_MAX —
           the harmonic mean rewritten so every term is an integer
           (DECIMAL(38,0) div on Spark ≡ HUGEINT // on DuckDB, probed
           equal); V = non-empty register count.
    When V < m and raw ≤ 5m/2, small-range linear counting applies over
    the EMPTY-register count Z = m − V:
           lc = (m · floor(10^6·ln(m/Z))) div 10^6
    — ln is the single float op; only 255 possible arguments exist, and
    tests/test_sketch_hll_bloom.py audits every one against its floor
    boundary (the tfidf idf discipline; min observed distance over the
    whole domain is 5.7e-4, ~6 orders above worst-case libm ulp noise).

    Returns (grp?, n_buckets INT, est BIGINT).
    """
    keys = [group_col] if group_col else []
    agg = (registers.groupBy(*keys)
           .agg(F.count("*").cast("int").alias("n_buckets"),
                F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - max_rho)"))
                .alias("pow_sum")))
    s_full = (F.lit(HLL_M) - F.col("n_buckets")).cast("long") \
        * F.lit(1 << HLL_RHO_MAX) + F.col("pow_sum")
    raw = F.expr(
        f"CAST({HLL_RAW_NUM} AS DECIMAL(38,0)) div "
        f"(CAST(1000000 AS DECIMAL(38,0)) * CAST(__s AS DECIMAL(38,0)))"
    ).cast("long")
    ln_ppm = F.floor(F.lit(10**6)
                     * F.log(F.lit(float(HLL_M))
                             / (F.lit(HLL_M) - F.col("n_buckets"))))
    lc = F.expr(f"CAST({HLL_M} AS BIGINT) * __ln_ppm div 1000000")
    return (agg.withColumn("__s", s_full)
            .withColumn("__raw", raw)
            .withColumn("__ln_ppm", ln_ppm)
            .select(*keys, "n_buckets",
                    F.when((F.col("n_buckets") < HLL_M)
                           & (F.col("__raw") <= 5 * HLL_M // 2), lc)
                    .otherwise(F.col("__raw"))
                    .cast("long").alias("est")))


def hll_bias(raw) -> "F.Column":
    """Piecewise-linear interpolated bias at integer raw estimate ``raw``
    over HLL_BIAS_TABLE — the HLL++ mid-range correction term. Every
    term is a non-negative BIGINT (anchors ascending, biases >= 0), so
    Spark's ``div`` and DuckDB's ``//`` agree (trunc == floor on
    non-negatives) and the correction is exact cross-engine. Below the
    first anchor the first bias applies; at/above the last anchor the
    last (zero) bias applies."""
    raw = F.col(raw) if isinstance(raw, str) else raw
    tbl = HLL_BIAS_TABLE
    expr = F.when(raw < tbl[0][0], F.lit(tbl[0][1]))
    for (x0, b0), (x1, b1) in zip(tbl, tbl[1:]):
        # numerator <= max_bias * anchor_gap ~ 700: exact in a double,
        # so floor(/) == integer floor division on both engines
        num = (F.lit(b0) * (F.lit(x1) - raw)
               + F.lit(b1) * (raw - F.lit(x0)))
        expr = expr.when(raw < x1, F.floor(num / F.lit(x1 - x0)))
    return expr.otherwise(F.lit(tbl[-1][1])).cast("long")


def hll_bias_case_sql(raw_expr: str) -> str:
    """The DuckDB CASE ladder computing hll_bias(raw_expr) from the SAME
    HLL_BIAS_TABLE literals — embed in oracle SQL so the interpolation
    arithmetic is replayed bit-identically (integer // only)."""
    tbl = HLL_BIAS_TABLE
    parts = [f"WHEN {raw_expr} < {tbl[0][0]} THEN {tbl[0][1]}"]
    for (x0, b0), (x1, b1) in zip(tbl, tbl[1:]):
        parts.append(
            f"WHEN {raw_expr} < {x1} THEN "
            f"(({b0} * ({x1} - {raw_expr}) + {b1} * ({raw_expr} - {x0})))"
            f" // {x1 - x0}")
    return ("CASE " + " ".join(parts)
            + f" ELSE {tbl[-1][1]} END")


def hll_estimate_corrected(registers: DataFrame,
                           group_col: str | None = None) -> DataFrame:
    """HLL++ bias-corrected estimate (Heule et al., EDBT'13): identical
    to hll_estimate except in the mid range — when linear counting does
    NOT apply (registers full, or raw past the 5m/2 handoff) and
    raw <= 5m, return raw - hll_bias(raw), the empirically-calibrated
    overestimation of the raw harmonic-mean estimator. Branches:

        V < m and raw <= 5m/2  ->  linear counting      (unchanged)
        raw <= 5m              ->  raw - bias(raw)      (NEW, HLL++)
        else                   ->  raw                  (unchanged)

    The lc handoff keeps this repo's audited small-range behavior (the
    paper's per-precision threshold table serves the same crossover
    role); tests/test_sketch_hll_bloom.py pins the corrected estimator
    strictly more accurate than hll_estimate on hold-out mid-range
    streams. Same input registers, same single shuffle; the correction
    is a constant-folded scalar CASE."""
    keys = [group_col] if group_col else []
    agg = (registers.groupBy(*keys)
           .agg(F.count("*").cast("int").alias("n_buckets"),
                F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - max_rho)"))
                .alias("pow_sum")))
    s_full = (F.lit(HLL_M) - F.col("n_buckets")).cast("long") \
        * F.lit(1 << HLL_RHO_MAX) + F.col("pow_sum")
    raw = F.expr(
        f"CAST({HLL_RAW_NUM} AS DECIMAL(38,0)) div "
        f"(CAST(1000000 AS DECIMAL(38,0)) * CAST(__s AS DECIMAL(38,0)))"
    ).cast("long")
    ln_ppm = F.floor(F.lit(10**6)
                     * F.log(F.lit(float(HLL_M))
                             / (F.lit(HLL_M) - F.col("n_buckets"))))
    lc = F.expr(f"CAST({HLL_M} AS BIGINT) * __ln_ppm div 1000000")
    return (agg.withColumn("__s", s_full)
            .withColumn("__raw", raw)
            .withColumn("__ln_ppm", ln_ppm)
            .select(*keys, "n_buckets",
                    F.when((F.col("n_buckets") < HLL_M)
                           & (F.col("__raw") <= 5 * HLL_M // 2), lc)
                    .when(F.col("__raw") <= 5 * HLL_M,
                          F.col("__raw") - hll_bias("__raw"))
                    .otherwise(F.col("__raw"))
                    .cast("long").alias("est")))


def hll_intersect_estimate(a: DataFrame, b: DataFrame,
                           group_col: str | None = None) -> DataFrame:
    """Distinct-intersection estimate from two HLL sketches via
    inclusion-exclusion: |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), with
    the union estimate read off ``hll_merge(a, b)`` — the union costs
    NOTHING beyond a register MAX because HLL is mergeable, which is the
    whole point: overlap between two 100 TB corpora from two 256-row
    tables. Clamped at 0 (inclusion-exclusion noise can go negative when
    the true overlap is small relative to the sketch error).

    Returns (grp?, est_a, est_b, est_union, est_intersect — all BIGINT).
    Every term is the deterministic integer estimator, so the result
    replays in SQL; the gate oracle computes est_union from the row-
    level union directly, making the hash-match a mergeability proof on
    real data.
    """
    keys = [group_col] if group_col else []

    def est_as(sk_df, name):
        e = hll_estimate(sk_df, group_col).drop("n_buckets")
        return e.withColumnRenamed("est", name)

    ea, eb = est_as(a, "est_a"), est_as(b, "est_b")
    eu = est_as(hll_merge(a, b), "est_union")
    if keys:
        j = ea.join(eb, keys, "outer").join(eu, keys, "outer")
    else:
        j = ea.crossJoin(eb).crossJoin(eu)
    # a group absent from one side has est 0 (empty sketch)
    j = j.na.fill(0, ["est_a", "est_b"])
    return j.select(
        *keys, "est_a", "est_b", "est_union",
        F.greatest(F.lit(0).cast("long"),
                   F.col("est_a") + F.col("est_b") - F.col("est_union"))
        .alias("est_intersect"))


def hll_sliding_estimate(df: DataFrame, value_col: str,
                         ts_col: str = "ts", trailing: int = 3
                         ) -> DataFrame:
    """Trailing-window distinct estimates from hourly HLL sketches: for
    every hour h present in the data, the estimated distinct count over
    hours (h−trailing+1 .. h) — the sliding-window cardinality dashboard
    query, answered WITHOUT rescanning any hour twice. Each hourly
    sketch is built once, then contributes to its ``trailing`` target
    windows via an explode of literal second-offsets (map-only — no
    range join, no BNLJ) and a re-MAX per (window, register): HLL
    mergeability is what makes the frame reuse free.

    Scale shape: state is ≤ 256 registers per hour; the explode
    multiplies SKETCH rows (hours × 256 × trailing), never data rows.
    Windows are anchored to hours present in the data (broadcast
    semi-join of the distinct hour set).

    Returns (win_end BIGINT hour-epoch, n_buckets INT, est BIGINT).
    """
    if trailing < 1:
        raise ValueError(f"trailing must be >= 1, got {trailing}")
    hours = df.select(
        F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))).alias("hr"),
        F.col(value_col).alias("v"))
    hourly = hll_sketch(hours, "v", "hr")
    offs = F.explode(F.lit([3600 * i for i in range(trailing)])).alias("off")
    contrib = (hourly.select("hr", "bucket", "max_rho", offs)
               .select((F.col("hr") + F.col("off")).alias("win_end"),
                       "bucket", "max_rho"))
    present = hourly.select(F.col("hr").alias("win_end")).distinct()
    regs = (contrib.join(F.broadcast(present), "win_end")
            .groupBy("win_end", "bucket")
            .agg(F.max("max_rho").cast("int").alias("max_rho")))
    return hll_estimate(regs, "win_end")


# ---------------------------------------------------------------------------
# HLL++ sparse representation (r7, Heule et al. 2013 §5.3).
#
# The dense sketch above pays m = 256 registers of resolution no matter
# how few values a group has seen. HLL++'s observation: while the
# register table is mostly empty you can afford to store (index, rho)
# PAIRS instead — and because pairs are cheap, store them at a much
# higher precision p' > p, where linear counting is far more accurate
# (stddev ~ sqrt(m')·f(V) vs the dense harmonic estimator's 1.04/sqrt(m)
# relative error). The two encodings share the SAME 60-bit hash, so a
# sparse pair at p'=14 downconverts to its dense p=8 register EXACTLY:
#   bucket = idx >> 6, and the 6 low idx bits become the TOP 6 bits of
#   the dense rho field — rho_dense = 7 - bitlen(low6) when low6 != 0
#   else 6 + rho_sparse. max() commutes with this map (it is monotone in
#   rho_sparse where it depends on it at all), so converting the
#   max-aggregated sparse sketch equals sketching dense directly —
#   pinned row-for-row in tests AND by the gate oracle, which computes
#   the dense registers straight from the hashes while the Spark side
#   only ever sees sparse pairs.
# ---------------------------------------------------------------------------

HLL_SP = 14                    # sparse-precision index bits
HLL_SM = 1 << HLL_SP           # 16384 sparse slots
HLL_SW = 60 - HLL_SP           # 46 sparse rho bits
HLL_SRHO_MAX = HLL_SW + 1      # rho when the 46 rho bits are all zero
HLL_SHIFT = HLL_SP - HLL_P     # 6 bits between the two precisions


def hll_sparse_sketch(df: DataFrame, value_col, group_col: str | None = None
                      ) -> DataFrame:
    """Per-group HLL++ sparse pairs at p' = 14 for ``value_col``.

    Same md5-derived 60-bit hash as :func:`hll_sketch`; the top HLL_SP
    bits pick the slot, the leading-zero run of the remaining HLL_SW
    bits sets rho. Returns (grp?, idx INT, max_rho INT) — one row per
    OCCUPIED slot, so state is min(V, 16384) pairs per group: smaller
    than the dense table while V is small (the sparse regime), and
    convertible to it exactly (``hll_sparse_to_dense``) when it isn't.
    One shuffle: the map-side-combined MAX on (grp, idx).
    """
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = [group_col] if group_col else []
    rows = (df.select(*keys, c.cast("string").alias("__v"))
            .filter(F.col("__v").isNotNull()))
    hv = F.conv(F.substring(F.md5(F.col("__v")), 1, 15), 16, 10).cast("long")
    idx = F.shiftright(hv, HLL_SW).cast("int").alias("idx")
    rest = hv.bitwiseAND(F.lit((1 << HLL_SW) - 1))
    rho = (F.when(rest == 0, F.lit(HLL_SRHO_MAX))
           .otherwise(F.lit(HLL_SW + 1) - F.length(F.bin(rest)))
           .cast("int"))
    return (rows.select(*keys, idx, rho.alias("rho"))
            .groupBy(*keys, "idx")
            .agg(F.max("rho").cast("int").alias("max_rho")))


def hll_sparse_to_dense(sparse: DataFrame) -> DataFrame:
    """EXACT downconversion of sparse p'=14 pairs to the dense p=8
    register table — the HLL++ mode switch. The 6 low idx bits are the
    top 6 bits of the dense 52-bit rho field:

      low6 != 0:  rho_dense = 7 - bitlen(low6)   (independent of rho')
      low6 == 0:  rho_dense = 6 + rho'

    Output schema matches :func:`hll_sketch` exactly, and
    tests/test_sketch_hll_bloom.py pins conversion(sparse(A)) equal
    row-for-row to the directly-built dense sketch. Group columns pass
    through untouched (anything that isn't idx/max_rho).
    """
    keys = [c for c in sparse.columns if c not in ("idx", "max_rho")]
    low = F.col("idx").bitwiseAND(F.lit((1 << HLL_SHIFT) - 1))
    bucket = F.shiftright(F.col("idx"), HLL_SHIFT).cast("int")
    rho52 = (F.when(low == 0, F.col("max_rho") + F.lit(HLL_SHIFT))
             .otherwise(F.lit(HLL_SHIFT + 1) - F.length(F.bin(low))))
    return (sparse
            .select(*keys, bucket.alias("bucket"),
                    rho52.cast("int").alias("rho"))
            .groupBy(*keys, "bucket")
            .agg(F.max("rho").cast("int").alias("max_rho")))


def hll_sparse_estimate(sparse: DataFrame, group_col: str | None = None
                        ) -> DataFrame:
    """HLL++ estimate from sparse pairs: linear counting at the SPARSE
    precision while the slot table has room, the dense harmonic
    estimator (via exact downconversion) once it doesn't — the paper's
    size-driven mode switch, expressed per group.

      sparse regime (V < m'):  lc = (m' · floor(10^6·ln(m'/Z))) div 10^6
                               with m' = 16384, Z = m' − V
      saturated   (V = m'):    hll_estimate(hll_sparse_to_dense(...))

    ln is the single float op; its 16383-argument domain is audited
    against floor boundaries in tests/test_sketch_hll_bloom.py (min
    observed margin 7.6e-6, ~3 orders above worst-case libm ulp noise —
    same discipline as the dense lc audit).

    Returns (grp?, n_pairs INT, est BIGINT).
    """
    keys = [group_col] if group_col else []
    pairs = (sparse.groupBy(*keys)
             .agg(F.count("*").cast("int").alias("n_pairs")))
    dense_est = (hll_estimate(hll_sparse_to_dense(sparse), group_col)
                 .withColumnRenamed("est", "__dense_est")
                 .drop("n_buckets"))
    ln_ppm = F.floor(F.lit(10**6)
                     * F.log(F.lit(float(HLL_SM))
                             / (F.lit(HLL_SM) - F.col("n_pairs"))))
    lc = F.expr(f"CAST({HLL_SM} AS BIGINT) * __ln_ppm div 1000000")
    joined = (pairs.join(dense_est, keys) if keys
              else pairs.crossJoin(F.broadcast(dense_est)))
    return (joined.withColumn("__ln_ppm",
                              F.when(F.col("n_pairs") < HLL_SM, ln_ppm)
                              .otherwise(F.lit(0)))
            .select(*keys, "n_pairs",
                    F.when(F.col("n_pairs") < HLL_SM, lc)
                    .otherwise(F.col("__dense_est"))
                    .cast("long").alias("est")))


# ---------------------------------------------------------------------------
# Bloom filter (r7): the explicit runtime-filter shape.
#
# Spark's optimizer injects bloom joins on its own
# (spark.sql.optimizer.runtime.bloomFilter.enabled), but its hash is not
# replayable in an oracle and the filter is planner-discretionary. This
# is the deterministic, user-directed variant: build once from the small
# side (state is m_bits BITS — a few KiB — regardless of build-side row
# count), then prune the big side MAP-ONLY before it ever reaches the
# shuffle of a join: each probe row tests k bits of a literal bitmap
# embedded in the plan, no join, no shuffle, no Python. At 100 TB this
# is the difference between shuffling every fact row and shuffling the
# ~selectivity fraction that can possibly match. Zero false negatives by
# construction; false-positive rate ≈ (1 − e^(−k·n/m))^k.
# ---------------------------------------------------------------------------


def _bloom_pos(i: int, key) -> "F.Column":
    """Bit position of hash i for a key: md5-derived 60-bit int mod m —
    the same '<i>:<value>' keyed-md5 family as cms_sketch, so the oracle
    replays positions exactly. Returned UNMODDED; callers mod by m."""
    return F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(i)), key.cast("string"))),
        1, 15), 16, 10).cast("long")


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 32768,
                k_hashes: int = 3) -> list[int]:
    """Build a bloom bitmap from the (small) build side's keys.

    Distributed part: one distinct on positions — at most m_bits rows
    survive, so the collect() is m_bits-bounded METADATA (same class as
    the centroid collects, see SCALING.md), not data. Returns the bitmap
    as m_bits/64 signed 64-bit words for literal embedding in the probe
    plan."""
    if m_bits % 64 != 0 or m_bits < 64:
        raise ValueError(f"m_bits must be a positive multiple of 64, "
                         f"got {m_bits}")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    key = F.col(key_col)
    pos_rows = (df.filter(key.isNotNull())
                .select(F.explode(F.array(*[
                    F.pmod(_bloom_pos(i, key), F.lit(m_bits)).cast("int")
                    for i in range(k_hashes)])).alias("pos"))
                .distinct().collect())
    words = [0] * (m_bits // 64)
    for row in pos_rows:
        p = row["pos"]
        words[p // 64] |= 1 << (p % 64)
    # two's-complement fold so each word is a valid Spark LongType literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(key, words: list[int], m_bits: int = 32768,
                        k_hashes: int = 3) -> "F.Column":
    """Map-only membership test against a bloom bitmap built by
    bloom_build: AND over k of bit tests
    (words[pos div 64] >> (pos mod 64)) & 1 — arithmetic shiftright
    extracts any bit correctly under two's complement, including bit 63.
    Pure Catalyst expressions over a literal array; O(1) per row.

    NULL keys test FALSE explicitly: concat_ws SKIPS nulls (Spark would
    otherwise hash the bare '<i>' salt and return a data-independent
    coin flip), while SQL || propagates NULL — pinning false on both
    engines keeps the oracle exact under NULL keys (fuzz-found class)."""
    if len(words) * 64 != m_bits:
        raise ValueError(
            f"bitmap carries {len(words) * 64} bits but m_bits={m_bits} — "
            f"probe must use the SAME m_bits the bitmap was built with "
            f"(a mismatch silently breaks the zero-false-negative "
            f"guarantee)")
    if k_hashes < 1:
        raise ValueError(f"k_hashes must be >= 1, got {k_hashes}")
    key = F.col(key) if isinstance(key, str) else key
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = None
    for i in range(k_hashes):
        pos = F.pmod(_bloom_pos(i, key), F.lit(m_bits))
        word = F.element_at(arr, (F.floor(pos / F.lit(64)) + 1).cast("int"))
        bit = F.call_function("shiftright", word, F.pmod(pos, F.lit(64)))
        c = bit.bitwiseAND(F.lit(1)) == 1
        cond = c if cond is None else (cond & c)
    return F.when(key.isNull(), F.lit(False)).otherwise(cond)


def quantile_sketch(df: DataFrame, value_col: str, id_expr,
                    k: int = 1024) -> DataFrame:
    """The PERSISTABLE bottom-k quantile sketch (r8): the k rows with
    the smallest ``kmv_hash(id)`` priorities, carried as (v, hv) — what
    a daily pipeline WRITES so tomorrow's run can
    :func:`quantile_sketch_merge` new data in without re-scanning
    history (the same persisted-sketch contract as kmv_sketch /
    cms_sketch / hll_sketch).

    Mergeability is EXACT, not approximate: min-wise priority sampling
    commutes with union — bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    bottom-k(B)) — because membership depends only on a row's own hash
    priority vs the k-th smallest. So fold ≡ full recompute, value for
    value (the quantile_incremental gate hash-proves it).

    NULL values are dropped (quantiles are over the observed
    distribution; a NULL would also rank differently across engines).
    TakeOrdered ships at most k rows per partition.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (df.select(F.col(value_col).alias("v"),
                      kmv_hash(id_expr).alias("hv"))
            .filter(F.col("v").isNotNull())
            .orderBy("hv").limit(k))


def quantile_sketch_merge(*sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Union bottom-k sketches and re-take the k smallest priorities —
    the exact-merge step (see quantile_sketch). Input order is
    irrelevant. The (hv, v) dedup makes the fold IDEMPOTENT — merging
    the same batch twice (a foreachBatch restart replay) changes
    nothing, the property the streaming maintenance path needs; it
    deviates from a full-data build only when two distinct rows share
    a 60-bit hash AND a value boundary sits on the duplicate
    (~k²/2^60 — the same accepted collision class as kmv_hash)."""
    if not sketches:
        raise ValueError("need at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.dropDuplicates(["hv", "v"]).orderBy("hv").limit(k)


def quantiles_from_sketch(sample: DataFrame,
                          qs: tuple[float, ...] = (0.5, 0.95, 0.99)
                          ) -> DataFrame:
    """Lower-quantile selection over a bounded (v, hv) sample — the
    estimate step shared by sampled_quantiles and the persisted-sketch
    path: rank floor(q·(n−1))+1 over the deterministic (v, hv) order.
    The unpartitioned window is over the k-row sample, never the data
    (same boundedness note as sampled_quantiles). Returns
    (q DOUBLE, value, n_sample BIGINT)."""
    from pyspark.sql import Window

    if not qs or not all(0.0 <= q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in [0,1], got {qs}")
    w = Window.orderBy("v", "hv")
    ranked = (sample
              .select("v", F.row_number().over(w).alias("rv"),
                      F.count("*").over(
                          Window.rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing))
                      .alias("n")))
    targets = F.array(*[F.struct(F.lit(float(q)).alias("q"),
                                 (F.floor(F.lit(float(q)) * (F.col("n") - 1))
                                  + 1).alias("rq")) for q in qs])
    return (ranked
            .select("v", "rv", F.col("n").alias("n_sample"),
                    F.explode(targets).alias("t"))
            .filter(F.col("rv") == F.col("t.rq"))
            .select(F.col("t.q").alias("q"), F.col("v").alias("value"),
                    "n_sample"))


def ams_sign(j: int, col) -> "F.Column":
    """The ±1 estimator-j sign for a value: low bit of the first hex
    digit of md5('<j>:<value>'), mapped to {+1, −1}. md5 is the one hash
    available bit-identically in every engine (the kmv_hash rationale),
    so the SKETCH — not just its error bound — replays in a SQL oracle."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"),
                                          c.cast("string"))), 1, 1),
               16, 10).cast("int")
    return (F.lit(1) - F.lit(2) * (h % 2)).cast("long")


def ams_f2(df: DataFrame, value_col: str, group_col: str,
           groups: int = 5, per_group: int = 8) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy 1996)
    per group: estimates F₂ = Σ_t c_t² — the self-join size, the
    quantity a planner needs to size a join on a skewed key and the
    classic "tug-of-war" streaming sketch.

    Estimator: X_j = (Σ_t sign_j(t)·c_t)² with 4-wise-independent-style
    signs (here md5-derived, ``ams_sign``); E[X_j] = F₂. Variance is
    tamed median-of-means style: means over ``per_group`` estimators,
    lower median over an ODD number of ``groups`` — both exact integer
    operations (div for the mean, array_sort + index for the median),
    so the published estimate is bit-reproducible cross-engine.

    Shape: ONE hash aggregation collapses the value stream to (group,
    value, c) — the only data-sized shuffle; then one aggregation
    computes all groups·per_group signed sums UNROLLED as sum
    expressions (the embed_centroids/minhash discipline — no 40×
    explode of the vocab table) alongside the exact F₂ = Σ c² for the
    error report. Sketch state is O(groups·per_group) longs per group:
    linear in nothing — mergeable by addition across batches.

    Squares/sums run in DECIMAL(38): exact while Σ_t c_t < 10¹⁴ tokens
    per group (past that, the estimate column would also overflow its
    BIGINT — re-type both to DECIMAL then). Returns
    (group_col, f2_exact, f2_est, err_ppm) — err_ppm =
    |est − exact|·10⁶ div exact.
    """
    if groups < 1 or groups % 2 == 0:
        raise ValueError(f"groups must be odd and >= 1, got {groups}")
    if per_group < 1:
        raise ValueError(f"per_group must be >= 1, got {per_group}")
    cnt = (df.groupBy(group_col, F.col(value_col).cast("string")
                      .alias("__v"))
           .agg(F.count("*").alias("__c")))
    r = groups * per_group
    sums = [F.sum(ams_sign(j, "__v") * F.col("__c"))
            .cast("decimal(19,0)").alias(f"__s{j}") for j in range(r)]
    exact = F.sum(F.col("__c").cast("decimal(19,0)") * F.col("__c")) \
        .cast("decimal(38,0)").alias("__f2")
    agg = cnt.groupBy(group_col).agg(exact, *sums)
    means = [
        F.expr("(" + " + ".join(
            f"CAST(__s{g * per_group + i} AS DECIMAL(38,0))"
            f" * __s{g * per_group + i}" for i in range(per_group))
            + f") div {per_group}")
        for g in range(groups)]
    est = F.array_sort(F.array(*[m.cast("decimal(38,0)") for m in means])) \
        .getItem((groups - 1) // 2)
    return (agg.select(group_col, F.col("__f2").alias("__f2"),
                       est.alias("__est"))
            .select(group_col,
                    F.col("__f2").cast("long").alias("f2_exact"),
                    F.col("__est").cast("long").alias("f2_est"),
                    F.expr("abs(__est - __f2) * 1000000 div __f2")
                    .cast("long").alias("err_ppm")))


def ams_sketch(df: DataFrame, value_col: str, group_col: str,
               groups: int = 5, per_group: int = 8) -> DataFrame:
    """The AMS sketch as PERSISTABLE STATE: (group, j, s) rows, one per
    estimator — s_j = Σ_rows sign_j(value), which equals the
    Σ_t sign_j(t)·c_t of :func:`ams_f2` (each occurrence contributes
    its sign once). Linear in the data, so sketches MERGE BY ADDITION
    (:func:`ams_merge`) — the persisted-sketch family's contract
    (KMV/CMS/HLL/quantile), which is what lets a streaming pipeline
    fold micro-batches without re-scanning history. One aggregation,
    sums unrolled, posexploded to rows. State: groups·per_group longs
    per group."""
    if groups < 1 or groups % 2 == 0:
        raise ValueError(f"groups must be odd and >= 1, got {groups}")
    if per_group < 1:
        raise ValueError(f"per_group must be >= 1, got {per_group}")
    r = groups * per_group
    # r12 (guide §1.2/§2.3): collapse to (group, value, count) BEFORE
    # signing — sign_j depends only on the value, so
    # Σ_rows sign_j(v) = Σ_v sign_j(v)·c_v and the r·md5 cost drops from
    # per-ROW to per-DISTINCT-value (ams_f2's shape; measured 2.6×
    # faster on the stream_ams replay). Bit-identical by linearity.
    cnt = (df.groupBy(group_col, F.col(value_col).cast("string")
                      .alias("__v"))
           .agg(F.count("*").alias("__c")))
    sums = [F.sum(ams_sign(j, "__v") * F.col("__c")).cast("long")
            .alias(f"__s{j}") for j in range(r)]
    agg = cnt.groupBy(group_col).agg(*sums)
    return (agg.select(group_col,
                       F.posexplode(F.array(*[F.col(f"__s{j}")
                                              for j in range(r)]))
                       .alias("j", "s"))
            .select(group_col, F.col("j").cast("int").alias("j"),
                    F.coalesce("s", F.lit(0)).cast("long").alias("s")))


def ams_merge(*sketches: DataFrame) -> DataFrame:
    """Merge AMS sketches by ADDING matching (group, j) cells — exact
    (the signed sum is linear), so merge(sketch(A), sketch(B)) ≡
    sketch(A ∪ B) value-for-value. Like CMS, additive merge is NOT
    restart-idempotent; exactly-once rests on foreachBatch's
    checkpointed batch ids."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gcol = [c for c in out.columns if c not in ("j", "s")][0]
    return out.groupBy(gcol, "j").agg(F.sum("s").cast("long").alias("s"))


def ams_estimate_f2(sketch: DataFrame, group_col: str,
                    groups: int = 5, per_group: int = 8) -> DataFrame:
    """F₂ estimate from persisted (group, j, s) sketch rows: means of
    s² over each band of ``per_group`` estimators (exact integer div),
    lower median across the odd ``groups`` bands (array_sort + index —
    collect_list order-independence restored by the sort). Returns
    (group_col, f2_est BIGINT). Bit-identical to :func:`ams_f2`'s
    estimate on the same data — pinned in tests."""
    band = (F.col("j") / per_group).cast("int")
    means = (sketch.groupBy(group_col, band.alias("__g"))
             .agg(F.expr("SUM(CAST(s AS DECIMAL(19,0)) * s)"
                         f" div {per_group}").alias("__m")))
    mid = (groups - 1) // 2
    return (means.groupBy(group_col)
            .agg(F.array_sort(F.collect_list("__m")).getItem(mid)
                 .cast("long").alias("f2_est")))


def cms_join_size(a: DataFrame, b: DataFrame, width: int = 256,
                  depth: int = 4) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches —
    the planner primitive: |A ⋈_k B| = Σ_v c_A(v)·c_B(v), estimated as
    the MIN over depth rows of the grid-row inner products (each row's
    dot ≥ the true size — every true match lands in matching cells —
    so the min is the tightest of depth upper bounds; the classic CMS
    inner-product estimator). Lets a pipeline size a prospective join
    from two depth×width state tables without touching either input.

    A depth row whose cells don't overlap at all has TRUE dot 0 and
    must count: the dots are re-anchored on a literal depth spine
    (missing row = 0) before the min, otherwise zero-overlap rows
    would silently drop out of the aggregation and inflate the
    estimate. DECIMAL(19) products — exact to 10¹⁸ matches per cell
    pair. Returns one row: (join_size_est BIGINT).
    """
    ga = _cms_guarded(a, width, depth).withColumnRenamed("cnt", "__ca")
    gb = _cms_guarded(b, width, depth).withColumnRenamed("cnt", "__cb")
    per_d = (ga.join(gb, ["d", "idx"])
             .groupBy("d")
             .agg(F.sum(F.expr("CAST(__ca AS DECIMAL(19,0)) * __cb"))
                  .cast("decimal(38,0)").alias("__dot")))
    spine = a.sparkSession.range(depth).select(
        F.col("id").cast("int").alias("d"))
    return (spine.join(per_d, "d", "left")
            .select(F.coalesce("__dot", F.lit(0)).alias("__dot"))
            .agg(F.min("__dot").cast("long").alias("join_size_est")))


def kmv_a_not_b(sk_a: DataFrame, sk_b: DataFrame,
                k: int = 256) -> DataFrame:
    """Theta-sketch style SET-DIFFERENCE estimate from two persisted KMV
    sketches → ``(grp, est_a_not_b BIGINT, sample_count BIGINT)`` — the
    incremental-corpus accounting query ("how many of this period's
    values were never seen before?") answered from O(k) state per group
    WITHOUT re-scanning either corpus, the way Theta sketches serve it
    in production warehouses.

    The a-not-b rule: θ = the stricter of the two sketches' k-th order
    statistics (a short sketch is exhaustive — θ = the full hash span);
    A's retained hashes BELOW θ are a uniform sample of A at rate
    θ/span; those absent from B's retained set are a uniform sample of
    A∖B at the same rate, so ``est = floor(sample_count · span / θ)``.
    When NEITHER sketch saturated, every hash is retained and the count
    is EXACT (the kmv_distinct degeneracy, inherited). The estimate is
    bit-reproducible cross-engine by the kmv_distinct argument:
    sample_count ≤ k, so count·2^60 is an exactly-representable double
    and the one IEEE division + floor round identically in Spark and
    DuckDB.

    Membership screening against B is sound because a KMV sketch
    retains EVERY distinct hash below its own θ, and the joint θ is ≤
    both — no hash below joint θ can be missing from B's sketch while
    present in B. Inputs are ``kmv_sketch`` frames (grp, mins) built
    with the SAME k (the kmv_merge k-consistency rule). Groups absent
    from B count all their sampled A-hashes as new (B genuinely empty
    there). Scale: a |groups|-row join of k-length arrays — pure
    metadata; the corpora were only ever scanned once, at sketch-build
    time."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    span = 16 ** 15
    a = sk_a.select("grp", F.col("mins").alias("mins_a"))
    b = sk_b.select("grp", F.col("mins").alias("mins_b"))
    j = a.join(b, "grp", "left").withColumn(
        "mins_b", F.coalesce("mins_b", F.array().cast("array<long>")))
    # when-guarded element_at: vanilla driver sessions run ANSI mode,
    # where an out-of-bounds element_at THROWS instead of returning NULL
    # (Spark's CaseWhen evaluates branches lazily, so the guard is safe)
    kth_a = F.when(F.size("mins_a") >= k,
                   F.element_at("mins_a", k))
    kth_b = F.when(F.size("mins_b") >= k,
                   F.element_at("mins_b", k))
    th = F.least(F.coalesce(kth_a, F.lit(span)),
                 F.coalesce(kth_b, F.lit(span)))
    j = j.withColumn("__th", th)
    samp = F.size(F.filter(
        "mins_a",
        lambda h: (h < F.col("__th"))
        & ~F.array_contains("mins_b", h))).cast("long")
    j = j.withColumn("__c", samp)
    saturated = kth_a.isNotNull() | (F.size("mins_b") >= k)
    est = F.when(saturated,
                 F.floor(F.col("__c").cast("double") * F.lit(float(span))
                         / F.col("__th"))) \
           .otherwise(F.col("__c"))
    return j.select("grp", est.cast("long").alias("est_a_not_b"),
                    F.col("__c").alias("sample_count"))
