"""TroughClient-compatible facade (reference: trough/client.py:45-334).

The reference client resolves segment→URL via RethinkDB, POSTs SQL over
HTTP, caches URLs, and runs a background promotion thread.  In the
Spark-native engine all of that collapses to direct store calls: there is no
registry hop (A15/A25 dropped, SURVEY §4.3), writes are durable at commit
(the promoter thread's job disappears), and read-your-writes holds trivially
because one SparkSession serves every segment (A4 dropped).

Method names and shapes mirror the reference so a trough user can switch:
``read / write / schema / schemas / register_schema / readable_segments /
readable_segments_matching / promote / delete_segment``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trough_spark.store import SegmentStore


class TroughClient:
    def __init__(self, spark: SparkSession, root: str):
        self._store = SegmentStore(spark, root)

    @property
    def store(self) -> SegmentStore:
        return self._store

    # -- read path (reference client.py:259-299) ----------------------------

    def read(self, segment_id: str, sql_tmpl: str, values=()) -> list[dict]:
        return self._store.read(segment_id, sql_tmpl, values)

    def read_df(self, segment_id: str, sql_tmpl: str, values=()) -> DataFrame:
        from trough_spark.dialect import interpolate

        return self._store.read_df(segment_id, interpolate(sql_tmpl, values))

    def read_many(self, segment_regex: str, sql: str) -> list[dict]:
        """Fan-out read (reference shell scatter, client.py:281-299) — but as
        one Spark query with global semantics."""
        return [r.asDict(recursive=True) for r in self._store.read_many_df(segment_regex, sql).collect()]

    # -- write path (reference client.py:237-257) ----------------------------

    def write(self, segment_id: str, sql_tmpl: str, values=(), schema_id: str = "default") -> None:
        from trough_spark.dialect import interpolate

        self._store.provision(segment_id, schema_id)
        self._store.write(segment_id, interpolate(sql_tmpl, values))

    # -- registry / lifecycle (reference client.py:140-235) ------------------

    def schemas(self) -> list[str]:
        return self._store.list_schemas()

    def schema(self, schema_id: str) -> str | None:
        return self._store.get_schema_sql(schema_id)

    def register_schema(self, schema_id: str, sql: str) -> bool:
        return self._store.set_schema(schema_id, sql)

    def readable_segments(self) -> list[dict]:
        return self._store.readable_segments()

    def readable_segments_matching(self, regex: str) -> list[str]:
        return self._store.segments_matching(regex)

    def promote(self, segment_id: str) -> dict:
        return self._store.promote(segment_id)

    def delete_segment(self, segment_id: str) -> None:
        self._store.delete_segment(segment_id)
