"""Compression-ratio quality signal (the Gopher/RefinedWeb rule).

Highly compressible text is repetitive text: boilerplate, keyword stuffing,
template spam. The classic corpus-quality filter computes
``len(deflate(text)) / len(text)`` per document and drops the tails (too
compressible = repetitive; incompressible = random noise/binary junk).

Engine notes:

- DEFLATE comes from the stdlib ``zlib`` — not an external dependency
  (same boundary the PNG codec uses). For a FIXED zlib level the output
  bytes are deterministic for a given zlib build, and the ratio is stable
  across runs/partitionings; the repo pins level 6.
- One ``mapInPandas`` stage, Arrow-batched; zlib's C deflate dominates, so
  the Python row loop is not the bottleneck. No shuffle — the signal is
  row-local, exactly like the Catalyst quality scores in
  ``functions/text.py`` it complements.
- ORACLE BOUNDARY (documented, deliberate): DuckDB has no DEFLATE
  function, so the driver gate for this op is rows-only — the weaker
  check. The pytest suite pins the semantics instead (ordering between
  repetitive/normal/random text, determinism across partitionings,
  ratio_ppm arithmetic replayed in Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RATIO_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("n_raw", T.LongType(), True),
    T.StructField("n_compressed", T.LongType(), True),
    T.StructField("ratio_ppm", T.LongType(), True),
])


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Per-document DEFLATE ratio: (doc_id, n_raw, n_compressed,
    ratio_ppm) with ratio_ppm = n_compressed·10^6 DIV n_raw (all-integer,
    so downstream thresholds are exact). NULL/empty text → n_raw 0 and
    NULL ratio (a threshold filter naturally skips them)."""
    if not 0 <= level <= 9:
        raise ValueError(f"zlib level must be 0-9, got {level}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        import pandas as _pd

        for pdf in batches:
            ids, nr, nc, rp = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                raw = (t or "").encode("utf-8")
                comp = len(zlib.compress(raw, level)) if raw else 0
                ids.append(int(i))
                nr.append(len(raw))
                nc.append(comp)
                rp.append(comp * 1_000_000 // len(raw) if raw else None)
            yield _pd.DataFrame({
                "doc_id": _pd.Series(ids, dtype="int64"),
                "n_raw": _pd.Series(nr, dtype="int64"),
                "n_compressed": _pd.Series(nc, dtype="int64"),
                "ratio_ppm": _pd.Series(rp, dtype="object"),
            })

    return (df.select(F.col(id_col), F.col(text_col))
            .mapInPandas(run, schema=RATIO_SCHEMA))


def compressibility_filter(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           min_ratio_ppm: int = 100_000,
                           max_ratio_ppm: int = 1_100_000,
                           level: int = 6) -> DataFrame:
    """Keep documents whose DEFLATE ratio sits in the healthy band —
    the composed filter a pipeline actually runs. Defaults follow the
    published heuristic shape: below ~0.1 the text is template/repeat
    spam, above ~1.1 it is incompressible junk (deflate overhead pushes
    random bytes slightly past 1.0); tune per corpus — short documents
    carry more deflate overhead, so bands for sub-KB docs sit higher.
    Returns the kept rows of ``df`` (semi-join on the id — document
    bytes never re-shuffle)."""
    keep = (compression_ratio(df, text_col, id_col, level)
            .filter(F.col("ratio_ppm").isNotNull()
                    & (F.col("ratio_ppm") >= min_ratio_ppm)
                    & (F.col("ratio_ppm") <= max_ratio_ppm))
            .select(F.col("doc_id").alias("__keep_id")))
    return df.join(keep, F.col(id_col) == F.col("__keep_id"), "leftsemi")
