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
