"""JSONL (newline-delimited JSON) ingest/egress for the pipeline tables.

Web-scale corpora ship as JSONL (one document object per line, gzip per
file) — the de-facto interchange format every training-data pipeline reads
and writes.  This source keeps ingestion Spark-native and SCHEMA-FIRST:

- one ``spark.read.text`` scan + ``from_json`` with an EXPLICIT schema —
  never schema inference, which at 100 TB costs a full extra pass over the
  data and can silently widen/narrow types between batches.  Parsing via
  ``from_json`` (rather than the json reader's ``_corrupt_record``
  machinery) keeps the malformed-line split a plain column expression:
  Spark forbids queries that reference only the corrupt-record column of a
  raw json scan, so the quarantine path would otherwise need a cache();
- malformed lines parse to a NULL struct and are quarantined with the raw
  line preserved (a crawl dump always has a few) instead of failing the
  ingest;
- compression is transparent (``.jsonl`` / ``.jsonl.gz`` both work — the
  gzip codec is per-file, so parallelism = number of files; shard uploads
  accordingly);
- the writer emits deterministic single-line JSON per row (no pretty
  printing), ready to round-trip.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

#: the canonical `documents` table shape (matches TESTDATA.md)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


_CORRUPT = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """Read JSONL: one row per line, with ``raw_line`` (the untouched
    input) and ``parsed`` (the typed struct; its ``_corrupt_record`` field
    is non-null exactly when the line is not valid JSON for ``schema``).
    One scan, no inference pass."""
    full = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    return spark.read.text(path).select(
        F.col("value").alias("raw_line"),
        F.from_json(
            F.col("value"), full, {"columnNameOfCorruptRecord": _CORRUPT}
        ).alias("parsed"),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): clean rows flatten the parsed struct to the schema
    columns; corrupt rows keep only the raw line — route them to a
    quarantine sink rather than killing a 100 TB ingest over one truncated
    shard."""
    bad = F.col(f"parsed.{_CORRUPT}").isNotNull() | F.col("parsed").isNull()
    clean = df.filter(~bad).select("parsed.*").drop(_CORRUPT)
    corrupt = df.filter(bad).select("raw_line")
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """Write one JSON object per line (Spark's json sink — one file per
    partition; repartition upstream to control shard count/size)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)
