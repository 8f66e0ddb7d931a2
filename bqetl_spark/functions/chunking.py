"""Document chunking, deterministic sampling, and sequence packing.

The three ops a training-data pipeline runs between "corpus is clean" and
"batches hit the trainer":

- ``doc_chunks``: split each document's token stream into fixed-size
  windows with overlap (context-window shaping). Pure Catalyst expressions
  (split / sequence / posexplode / slice) — one scan, no shuffle, no
  Python in the row path, so the same code chunks 100 TB with map-only
  parallelism.
- ``hash_sample``: deterministic corpus subsampling by md5 of the id.
  Hash-based (not rand()) so the sample is reproducible across runs,
  engines, and retries — the property that makes a 100 TB pipeline
  restartable — and membership is a row-local filter pushed to the scan.
- ``pack_sequences``: assign documents to fixed-token-budget packs by
  exclusive running sum within each source partition (the SQL-expressible
  formulation of greedy sequence packing). The only shuffle is the window
  partition-by; integer arithmetic end-to-end, so results are exact and
  order-stable on any cluster size.

All three are SQL-expressible and carry full DuckDB oracles in the driver
contract (doc_chunks / sample_hash / pack_sequences).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bqetl_spark.functions.text import token_count, tokens


def doc_chunks(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               size: int = 64, overlap: int = 16) -> DataFrame:
    """Overlapping token windows: chunk i covers tokens
    [1 + i*stride, 1 + i*stride + size) with stride = size - overlap.

    Every token lands in at least one chunk; the final chunk may be short.
    Empty/whitespace-only documents produce no rows. Output:
    (id_col, chunk_id, chunk_text, n_tokens).
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {size=} {overlap=}")
    stride = size - overlap
    toks = tokens(F.col(text_col))
    n = token_count(F.col(text_col))
    # 1-based start positions: 1, 1+stride, ... <= n (sequence is inclusive)
    starts = F.sequence(F.lit(1), n, F.lit(stride))
    return (df
            .filter(n > 0)
            .select(F.col(id_col), toks.alias("__toks"), n.alias("__n"),
                    F.posexplode(starts).alias("chunk_id", "__start"))
            .select(
                id_col,
                "chunk_id",
                F.concat_ws(" ", F.slice("__toks", F.col("__start"),
                                         F.lit(size))).alias("chunk_text"),
                F.least(F.lit(size), F.col("__n") - F.col("__start") + 1)
                 .alias("n_tokens")))


def hash_sample(df: DataFrame, rate: float, id_col: str = "doc_id",
                hex_digits: int = 8) -> DataFrame:
    """Keep ~``rate`` of rows, chosen by md5(id) — deterministic, uniform,
    and engine-portable (md5 hex compares identically everywhere).

    Membership: first ``hex_digits`` hex chars of md5(CAST(id AS STRING)),
    compared lexicographically against floor(rate * 16^digits) rendered in
    hex — a pure-string comparison both Spark and any SQL oracle evaluate
    identically (no float division, no platform rounding).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    cut = int(rate * (16 ** hex_digits))
    cut_hex = format(min(cut, 16 ** hex_digits - 1), f"0{hex_digits}x")
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, hex_digits)
    if cut >= 16 ** hex_digits:
        return df
    return df.filter(bucket < F.lit(cut_hex))


def pack_sequences(df: DataFrame, budget: int, text_col: str = "text",
                   id_col: str = "doc_id",
                   part_col: str = "source") -> DataFrame:
    """Fixed-token-budget packing: within each ``part_col`` partition, in
    ``id_col`` order, assign each doc to pack floor(exclusive_cumsum /
    budget).

    Packing guarantee (exclusive-cumsum rule, NOT a hard cap): a pack's
    total can exceed ``budget`` only via its LAST document straddling the
    pack boundary, so total < budget + that document's tokens (e.g.
    budget=10 with docs of 6,6 puts both in pack 0 at 12 tokens). A
    consumer that needs a hard per-pack cap — packing straight into a
    trainer context window — must truncate or split the straddling
    document downstream; the rule here is the one that stays an
    O(1)-state window expression and never reorders documents.
    Output: (id_col, part_col, pack_id, n_tokens). Exact: integer token
    counts and an integer window sum — no floating point anywhere.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n = token_count(F.col(text_col))
    w = (Window.partitionBy(part_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(n).over(w)
    return df.select(
        id_col, part_col,
        F.floor((cum - n) / F.lit(budget)).cast("long").alias("pack_id"),
        n.alias("n_tokens"))


def stratified_hash_sample(df: DataFrame, rates: dict[str, float],
                           strata_col: str, id_col: str = "doc_id",
                           default_rate: float = 0.0,
                           hex_digits: int = 8) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix balancer
    (e.g. downsample boilerplate-heavy sources, keep all rare-language
    docs). Same md5 membership rule as ``hash_sample``, with the cut
    chosen per stratum, so it stays a row-local scan filter and the same
    document keeps/drops consistently across runs and engines.
    """
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    span = 16 ** hex_digits

    def cut_hex(rate: float) -> str:
        return format(min(int(rate * span), span - 1), f"0{hex_digits}x")

    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, hex_digits)
    cut = F.lit(cut_hex(default_rate))
    for s, r in sorted(rates.items()):
        cut = F.when(F.col(strata_col) == s, F.lit(cut_hex(r))).otherwise(cut)
    keep = bucket < cut
    # a rate of exactly 1.0 must keep everything (cut_hex saturates at
    # span-1, which would drop the all-f bucket)
    full = [s for s, r in rates.items() if r >= 1.0]
    if default_rate >= 1.0:
        # NULL-stratum rows must also ride the escape hatch: isin() is NULL
        # (not false) for NULL, so `~isin` alone would silently drop a
        # NULL-stratum doc whose md5 bucket is the saturated all-f value
        keep = (keep | F.col(strata_col).isNull()
                | ~F.col(strata_col).isin(list(rates)))
    if full:
        keep = keep | F.col(strata_col).isin(full)
    return df.filter(keep)


def quota_sample(df: DataFrame, quotas: dict[str, int], strata_col: str,
                 id_col: str = "doc_id") -> DataFrame:
    """Per-stratum FIXED-COUNT sampling (data-mixing quotas): keep exactly
    min(quota, stratum size) documents per stratum, chosen by ascending
    md5(id) — a deterministic shuffle, so the picked set is stable across
    runs, engines, and cluster sizes (rate-based sampling can't hit exact
    counts; quotas are how a training-mixture spec is usually written).
    Strata
    absent from ``quotas`` (including NULL) are dropped.

    Scale shape: one window rank per stratum — a single shuffle on the
    stratum key; skewed strata are exactly the hot-key aggregation case,
    but the ranked value is a short hash and the quota cap means only
    quota rows per stratum survive the filter.
    """
    for s, q in quotas.items():
        if q < 0:
            raise ValueError(f"quota for stratum {s!r} must be >= 0, got {q}")
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    quota = F.lit(None).cast("long")
    for s, q in sorted(quotas.items()):
        quota = F.when(F.col(strata_col) == s, F.lit(q)).otherwise(quota)
    return (df.withColumn("__rk", F.row_number().over(w))
            .withColumn("__q", quota)
            .filter(F.col("__q").isNotNull() & (F.col("__rk") <= F.col("__q")))
            .drop("__rk", "__q"))


def temperature_quotas(df: DataFrame, strata_col: str, budget: int,
                       alpha: float = 0.5) -> DataFrame:
    """Temperature-scaled sampling quotas per stratum — the standard
    multilingual/multi-source rebalancing rule (sample source i with
    probability ∝ p_i^α where p_i is its corpus share; α < 1 upsamples
    the tail, α = 1 is proportional, α = 0 uniform).

    Cross-engine-exact arithmetic discipline (the repo's fixed-point
    pattern): p_i = n_i / N is one IEEE division; p_i^α goes through
    ``sqrt`` when α = 0.5 (correctly rounded everywhere, unlike the
    general ``pow``) and is then integerized as w_i = floor(p_i^α · 10^12)
    BIGINT; the quota is the all-integer floor((budget · w_i) DIV Σw) —
    no float leaves the per-stratum scalar, so the result is
    bit-identical on any engine or partitioning. For α ∉ {0.5, 1.0, 2.0}
    the general ``pow`` path is used and cross-engine bit-equality is NOT
    guaranteed (documented; the gate pins α = 0.5).

    Scale shape: one hash aggregation over the stratum key (map-side
    combined), then a |strata|-row window — the data-sized pass is the
    count, everything after is metadata-sized. Returns
    (strata_col, n_docs BIGINT, quota BIGINT). NULL strata count as a
    stratum. Σquota ≤ budget (floor rounding; the remainder is the
    standard largest-remainder follow-up a trainer applies if it wants
    the budget exact).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_docs"))
    n_total = F.sum("n_docs").over(Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    p = F.col("n_docs") / n_total
    if alpha == 0.5:
        pa = F.sqrt(p)
    elif alpha == 1.0:
        pa = p
    elif alpha == 2.0:
        pa = p * p
    else:  # general path: pow is not correctly rounded — see docstring
        pa = F.pow(p, F.lit(float(alpha)))
    wq = F.floor(pa * F.lit(1e12)).cast("long")
    wsum = F.sum(wq).over(Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing))
    # DECIMAL(38,0) product: budget·wq reaches budget·10^12, which
    # overflows int64 for any budget > ~9.2M — exactly the corpus-scale
    # budgets this op exists for (code-review r6 finding). DECIMAL keeps
    # the product exact to 38 digits; DIV floors back to BIGINT (quota ≤
    # budget, so the quotient always fits). Oracle mirrors with HUGEINT.
    return (counts
            .withColumn("__wq", wq)
            .withColumn("__wsum", wsum)
            .select(strata_col,
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.expr(f"CAST(CAST({int(budget)} AS DECIMAL(38,0)) "
                           "* __wq DIV __wsum AS BIGINT)").alias("quota")))


def temperature_sample(df: DataFrame, strata_col: str, budget: int,
                       alpha: float = 0.5,
                       id_col: str = "doc_id") -> DataFrame:
    """End-to-end temperature sampling: compute :func:`temperature_quotas`
    then keep each stratum's quota docs chosen by ascending md5(id) — the
    deterministic shuffle :func:`quota_sample` uses, so the picked SET is
    a pure function of the data.

    The quota table is |strata| rows and joins BROADCAST onto the ranked
    corpus (null-safe equality, so NULL strata sample like any other) —
    no driver collect, no per-stratum literal expression chain, and a
    thousands-of-sources corpus costs the same plan depth as three
    (code-review r6: the earlier chained-CASE version would have
    StackOverflowed Catalyst at that width).
    """
    quotas = (temperature_quotas(df, strata_col, budget, alpha)
              .select(F.col(strata_col).alias("__strat"),
                      F.col("quota").alias("__q")))
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (df.withColumn("__rk", F.row_number().over(w))
            .join(F.broadcast(quotas),
                  F.col(strata_col).eqNullSafe(F.col("__strat")))
            .filter(F.col("__rk") <= F.col("__q"))
            .drop("__rk", "__q", "__strat"))


def mixture_repeats(df: DataFrame, weights: dict[str, float],
                    strata_col: str, id_col: str = "doc_id",
                    hex_digits: int = 8) -> DataFrame:
    """Epoch-mixture assignment: each document gets a repeat count for its
    stratum's sampling weight — weight 2.3 means every doc appears twice
    and a deterministic 30% md5-bucket of docs a third time (how a
    training mixture over-/under-samples sources across epochs without
    RNG). Returns the df with an added ``n_repeats`` column; strata
    absent from ``weights`` (including NULL) default to weight 1.0.

    Row-local (scan filter + arithmetic, no shuffle); downstream exploding
    to physical repeats is ``explode(sequence(1, n_repeats))`` when the
    trainer wants materialized rows.
    """
    for s, wt in weights.items():
        if wt < 0:
            raise ValueError(f"weight for stratum {s!r} must be >= 0, "
                             f"got {wt}")
    # weights are build-time constants, so the per-stratum base count and
    # fractional md5 cut are computed in PYTHON (lowercase hex, matching
    # md5's output — same membership rule as hash_sample) and laid into
    # one CASE expression: the runtime plan is pure row-local arithmetic.
    span = 16 ** hex_digits
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, hex_digits)

    def repeats_of(wt: float):
        base = int(wt)
        frac_cut = min(int((wt - base) * span), span - 1)
        cut_hex = format(frac_cut, f"0{hex_digits}x")
        extra = (F.when(bucket < F.lit(cut_hex), F.lit(1)).otherwise(F.lit(0))
                 if frac_cut > 0 else F.lit(0))
        return (F.lit(base) + extra).cast("long")

    out = repeats_of(1.0)
    for s, wt in sorted(weights.items()):
        out = F.when(F.col(strata_col) == s, repeats_of(float(wt))) \
               .otherwise(out)
    return df.withColumn("n_repeats", out)


def chunk_tokens_udtf():
    """Document chunking as a Spark Python UDTF (the SQL-surface flat-map:
    ``FROM docs, LATERAL chunk_tokens(text, size, stride)``) — the same
    overlapping-token-window semantics as :func:`doc_chunks`, exposed
    through the first-class table-function API so SQL users can chunk
    without the DataFrame helper. Built fresh per call with a
    closure-local class, so cloudpickle ships it by value (workers never
    need this package importable).

    Row-at-a-time eval is the UDTF contract; chunking is string slicing,
    so the per-row Python cost is small — for the bulk path prefer
    doc_chunks (pure Catalyst expressions). Semantics pinned by the gate:
    doc_chunks_udtf shares doc_chunks' oracle verbatim."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id: bigint, chunk_text: string, n_tokens: bigint")
    class ChunkTokens:
        def eval(self, text, size: int, stride: int):
            toks = (text or "").split()
            i, cid = 0, 0
            while i < len(toks):
                window = toks[i:i + size]
                yield cid, " ".join(window), len(window)
                cid += 1
                i += stride

    return ChunkTokens


def weighted_sample(df: DataFrame, weight_col, n: int,
                    id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res): keep the n rows with the largest priority
    u^(1/w), ranked equivalently by key = ln(u)/w descending, where
    u = (60-bit md5 prefix of the id)/2^60 — the training-mixture sampler
    that favors high-weight docs but never hard-cuts low-weight ones.

    Determinism: u is an exact double (60-bit int rounds identically
    everywhere), w comes from row columns, and key = ln(u)/w is one libm
    call + one IEEE division — cross-engine safe as long as no ranking
    decision sits within ulp noise of the n-th/(n+1)-th gap (audited on
    the gate corpora in tests). Row-local priority + ORDER BY LIMIT n
    (TakeOrdered): the only cross-partition traffic is each partition's
    top-n candidates. Ties break by ascending id.

    Rows with weight <= 0 or NULL are excluded (they cannot be sampled).
    Returns the sampled rows with `priority_key` (the ln(u)/w key)
    appended.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    hv = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                16, 10).cast("long")
    u = hv.cast("double") / F.lit(float(16 ** 15))
    key = F.log(u) / w.cast("double")
    return (df.filter(w.isNotNull() & (w.cast("double") > 0))
            .withColumn("priority_key", key)
            .orderBy(F.desc("priority_key"), F.asc(id_col))
            .limit(n))


def shard_assignment(id_col, n_shards: int):
    """Deterministic shard id in [0, n_shards): md5-derived so the same
    document lands in the same shard across runs, engines and cluster
    sizes (xxhash64 would be faster but is not SQL-oracle-able)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hv = F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10)
    return F.pmod(hv.cast("long"), F.lit(n_shards))


def export_shards(df: DataFrame, path: str, n_shards: int,
                  id_col: str = "doc_id") -> DataFrame:
    """Write the training-export layout: ``shard=K/`` directories with
    deterministic md5-mod membership — the final packaging step before a
    trainer consumes the corpus (each data-loader rank reads its shard
    list; re-runs and backfills MUST route a document to the same shard,
    which random splits cannot guarantee).

    One partitionBy write; shard sizes concentrate tightly around
    rows/n_shards (md5 uniformity), so no rank starves. Returns the
    read-back DataFrame (shard column restored as BIGINT).
    """
    out = df.withColumn("shard", shard_assignment(id_col, n_shards))
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    back = df.sparkSession.read.parquet(path)
    return back.withColumn("shard", F.col("shard").cast("long"))
