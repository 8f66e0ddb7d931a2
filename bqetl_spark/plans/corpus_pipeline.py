"""End-to-end corpus curation: raw documents → training-ready chunks.

The pipeline a pretraining-data job actually runs, as one lazy DataFrame
lineage (no intermediate materialization except the near-dup keep-set,
which is itself bucket-local):

  1. quality gate      — Gopher/C4-style rule score (functions.text)
  2. language gate     — stopword-heuristic lang-id == target language
  3. repetition gate   — bigram repetition ratio below threshold
  4. exact dedup       — min doc_id per normalized-text fingerprint
  5. near dedup        — MinHash-LSH clusters reduced to their best-quality
                         member (functions.dedup.keep_best)
  6. sampling          — deterministic md5 corpus rate (optional)
  7. chunking          — overlapping token windows (functions.chunking)
  8. packing           — fixed-token-budget pack ids per source partition

Stage order matters at 100 TB: the row-local gates (1-3) fuse onto the
scan and shrink the corpus before anything shuffles; dedup then runs on
survivors only; chunk/pack are map-only + one window shuffle at the end.

Returns chunks keyed (doc_id, chunk_id, pack_id) with provenance columns,
ready for a partitioned write (sources.partitioned.write_partitioned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bqetl_spark.functions import text as tx
from bqetl_spark.functions.chunking import doc_chunks, hash_sample, pack_sequences
from bqetl_spark.functions.dedup import (dedup_clusters, dedup_fingerprint,
                                         keep_best)


def curate_corpus(docs: DataFrame,
                  lang: str = "en",
                  max_repetition: float = 0.2,
                  sample_rate: float | None = None,
                  chunk_size: int = 64,
                  chunk_overlap: int = 16,
                  pack_budget: int = 2048,
                  max_bucket_size: int | None = None) -> DataFrame:
    """Run the full curation; returns (doc_id, source, chunk_id, pack_id,
    chunk_text, n_tokens). ``docs`` needs (doc_id, text, source)."""
    # 1-3: row-local gates, fused on one scan
    quality = tx.quality_score(docs, "text").select("doc_id", "keep")
    langs = tx.lang_id(docs).select("doc_id", "lang_pred")
    reps = tx.gram_repetition(docs, "text").select("doc_id", "rep_ratio")
    kept = (docs
            .join(quality, "doc_id").filter(F.col("keep"))
            .join(langs, "doc_id").filter(F.col("lang_pred") == lang)
            .join(reps, "doc_id", "left")
            .filter(F.col("rep_ratio").isNull()
                    | (F.col("rep_ratio") <= max_repetition))
            .select(*docs.columns))

    # 4: exact dedup on normalized fingerprint (keep min id)
    exact_reps = dedup_fingerprint(kept, "text").select("doc_id")
    kept = kept.join(exact_reps, "doc_id", "leftsemi")

    # the gated+exact-deduped survivor set feeds FOUR consumers (cluster
    # pairs, quality scores, the pass-through anti-join, and chunking) —
    # pin it so the gate joins run once, not once per consumer; compact
    # (survivors only) so it spills safely at corpus scale
    from bqetl_spark.caching import pin

    kept = pin(kept)

    # 5: near-dup clusters → best-quality member survives; unclustered
    #    docs pass through (dedup_clusters returns clustered docs only)
    clusters = dedup_clusters(kept, max_bucket_size=max_bucket_size)
    scores = tx.quality_score(kept, "text").select("doc_id", "quality_score")
    best = keep_best(clusters, scores).select("doc_id")
    clustered = clusters.select("doc_id")
    kept = (kept.join(clustered, "doc_id", "left_anti")
            .unionByName(kept.join(best, "doc_id", "leftsemi")))

    # 6: optional deterministic downsample
    if sample_rate is not None:
        kept = hash_sample(kept, sample_rate)

    # 7-8: chunk, then pack the chunks themselves (each chunk is the unit
    #      a trainer consumes, so the budget applies to chunk tokens)
    chunks = doc_chunks(kept, size=chunk_size, overlap=chunk_overlap)
    chunks = (chunks
              .join(kept.select("doc_id", "source"), "doc_id")
              .withColumn("__cid",
                          F.col("doc_id") * 1_000_000 + F.col("chunk_id")))
    packed = pack_sequences(chunks.withColumnRenamed("chunk_text", "text"),
                            budget=pack_budget, id_col="__cid",
                            part_col="source")
    return (chunks
            .join(packed.select("__cid", "pack_id"), "__cid")
            .select("doc_id", "source", "chunk_id", "pack_id",
                    "chunk_text", "n_tokens"))


def run_corpus_pipeline(spark: SparkSession, docs_path: str, out_path: str,
                        n_shards: int | None = None, **kwargs) -> int:
    """Load → curate → partitioned parquet write. Returns the number of
    chunks written. Default layout partitions by source (analytics reads);
    ``n_shards`` switches to the trainer layout — shard=K/ directories
    with deterministic md5-mod membership over (doc_id, chunk_id), so a
    resumed or re-run export routes every chunk to the same data-loader
    rank (functions.chunking.export_shards semantics at the chunk
    level)."""
    from bqetl_spark.sources.parquet_source import ensure_ltz
    from bqetl_spark.sources.partitioned import write_partitioned

    docs = ensure_ltz(spark.read.parquet(docs_path))
    out = curate_corpus(docs, **kwargs)
    if n_shards is not None:
        from bqetl_spark.functions.chunking import shard_assignment

        key = F.concat_ws("_", "doc_id", "chunk_id")
        (out.withColumn("shard", shard_assignment(key, n_shards))
         .write.mode("overwrite").partitionBy("shard").parquet(out_path))
    else:
        write_partitioned(out, out_path, partition_cols=["source"])
    return spark.read.parquet(out_path).count()
