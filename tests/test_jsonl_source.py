"""JSONL ingest: explicit-schema read, corrupt-line quarantine, and a
lossless write -> read round-trip against the parquet documents table."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from trough_spark.sources import jsonl as J
from trough_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_read_clean_and_corrupt_lines(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11},
        {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "n_chars": 7},
    ]
    lines = [json.dumps(r) for r in rows]
    lines.insert(1, '{"doc_id": 3, "text": "truncated...')  # malformed
    lines.append("not json at all")
    p.write_text("\n".join(lines) + "\n")

    df = J.read_jsonl(spark, str(p))
    clean, corrupt = J.split_corrupt(df)
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "hello world", 2: "bonjour"}
    assert clean.columns == [f.name for f in J.DOCUMENTS_SCHEMA.fields]
    bad = sorted(r["raw_line"] for r in corrupt.collect())
    assert bad == sorted(['{"doc_id": 3, "text": "truncated...', "not json at all"])


def test_gzip_jsonl_is_transparent(spark, tmp_path):
    p = tmp_path / "docs.jsonl.gz"
    row = {"doc_id": 7, "text": "gz", "lang": "en", "source": "s", "n_chars": 2}
    with gzip.open(p, "wt") as f:
        f.write(json.dumps(row) + "\n")
    clean, corrupt = J.split_corrupt(J.read_jsonl(spark, str(p)))
    assert clean.count() == 1 and corrupt.count() == 0
    assert clean.collect()[0]["doc_id"] == 7


def test_roundtrip_documents_table(spark, tmp_path):
    """parquet documents -> JSONL -> back, bit-identical rows."""
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "out")
    J.write_jsonl(docs.repartition(4), out)
    assert len([f for f in os.listdir(out) if f.startswith("part-")]) == 4
    clean, corrupt = J.split_corrupt(J.read_jsonl(spark, out))
    assert corrupt.count() == 0
    a = {tuple(r) for r in docs.select(*sorted(docs.columns)).collect()}
    b = {tuple(r) for r in clean.select(*sorted(docs.columns)).collect()}
    assert a == b
