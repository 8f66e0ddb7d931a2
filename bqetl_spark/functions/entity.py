"""Entity resolution: blocking → pairwise similarity → connected
components → canonicalization.

The classic record-linkage pipeline (Fellegi-Sunter shape, deterministic
variant), composed from this engine's own primitives:

1. **Blocking** — candidate pairs come ONLY from an equi-self-join on
   the blocking columns (brand, domain, zip, …). This is the scale
   device: O(Σ block²) instead of O(N²), and the join is a plain hash
   join — no BNLJ, no cartesian. Block-size skew is the operational
   knob; key_skew_report is the diagnostic to run first.
2. **Similarity** — distinct-token overlap between the name fields
   (array_distinct/array_intersect stay in Catalyst; DuckDB's
   list_distinct/list_intersect replay them with the same set
   semantics, the parity dedup_clusters already leans on).
3. **Clustering** — undirected connected components over the match
   edges (functions.dedup.connected_components: min-label propagation
   + pointer jumping, converged-or-raise).
4. **Canonicalization** — the smallest id in each component is the
   surviving record; singletons are their own canon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bqetl_spark.functions.dedup import connected_components


def resolve_entities(df: DataFrame, id_col: str = "p_partkey",
                     name_col: str = "p_name",
                     block_cols: tuple[str, ...] = ("p_brand",),
                     min_common: int = 2,
                     max_block_size: int | None = None) -> DataFrame:
    """Resolve duplicate records: pairs within a block whose name fields
    share >= ``min_common`` distinct tokens are declared matches, and
    match-connected records collapse to one canonical id.

    Returns one row per input record:
    (id, canon_id, cluster_size BIGINT, is_canonical BOOLEAN) —
    unmatched records are singletons (canon_id = id, size 1).

    Scale shape: one equi-self-join per block (hash join on the block
    key), token overlap evaluated AFTER the block join on compact
    distinct-token arrays, then connected_components' bounded-round
    label propagation. Nothing is ever compared across blocks — recall
    beyond the blocking key is the standard ER trade, bought back in
    practice by running several blocking passes and unioning edges.

    ``max_block_size`` (r7, found by the sf1 slope run: a hot block is
    quadratic with no bound — the one candidate generator that lacked
    the guard the gram/edit/triangle ops all carry): blocks larger than
    the cap contribute NO pairs (deterministic drop-don't-truncate;
    their records stay in the output as singletons unless matched
    through another blocking pass). The production answer to a swollen
    block is a FINER blocking key, not a bigger cap — key_skew_report
    is the diagnostic. None (default) keeps the unguarded behavior the
    gate oracles replay.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    if not block_cols:
        raise ValueError("need at least one blocking column")
    if max_block_size is not None and max_block_size < 2:
        raise ValueError(f"max_block_size must be >= 2, got {max_block_size}")
    toks = F.array_distinct(F.split(F.trim(F.col(name_col)), r"\s+"))
    base = df.select(F.col(id_col).alias("__id"), toks.alias("__tk"),
                     *[F.col(c) for c in block_cols])
    if max_block_size is not None:
        ok = (base.groupBy(*block_cols)
              .agg(F.count("*").alias("__bn"))
              .filter(F.col("__bn") <= max_block_size)
              .drop("__bn"))
        base = base.join(ok, list(block_cols))
    a = base.select(F.col("__id").alias("id_a"),
                    F.col("__tk").alias("tk_a"),
                    *[F.col(c).alias(f"__ba_{c}") for c in block_cols])
    b = base.select(F.col("__id").alias("id_b"),
                    F.col("__tk").alias("tk_b"),
                    *[F.col(c).alias(f"__bb_{c}") for c in block_cols])
    cond = F.col("id_a") < F.col("id_b")
    for c in block_cols:
        cond = cond & (F.col(f"__ba_{c}") == F.col(f"__bb_{c}"))
    edges = (a.join(b, cond)
             .filter(F.size(F.array_intersect(F.col("tk_a"),
                                              F.col("tk_b")))
                     >= min_common)
             .select("id_a", "id_b"))
    comp = connected_components(edges, "id_a", "id_b")
    labeled = (df.select(F.col(id_col).alias("id"))
               .join(comp.withColumnRenamed("node", "id"), "id", "left")
               .select("id", F.coalesce("comp", F.col("id"))
                       .alias("canon_id")))
    sizes = (labeled.groupBy("canon_id")
             .agg(F.count("*").cast("long").alias("cluster_size")))
    return (labeled.join(sizes, "canon_id")
            .select("id", "canon_id", "cluster_size",
                    (F.col("id") == F.col("canon_id"))
                    .alias("is_canonical")))
