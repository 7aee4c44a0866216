"""TroughClient-compatible facade (reference: trough/client.py:45-334).

The reference client resolves segment→URL via RethinkDB, POSTs SQL over
HTTP, caches URLs, and runs a background promotion thread.  In the
Spark-native engine all of that collapses to direct store calls: there is no
registry hop (A15/A25 dropped, SURVEY §4.3), writes are durable at commit
(the promoter thread's job disappears), and read-your-writes holds trivially
because one SparkSession serves every segment (A4 dropped).

Method names and shapes mirror the reference so a trough user can switch:
``read / async_read / write / schema / schemas / schema_exists /
register_schema / readable_segments[(regex)] / readable_segments_matching /
promote / delete_segment / sql_value / write_url[_nocache] /
read_url[_nocache] / read_urls_for_regex``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trough_spark.store import SegmentStore


class TroughException(Exception):
    """Reference-compatible base error (trough/client.py:33-45)."""

    def __init__(self, message, payload=None, returned_message=None):
        super().__init__(message)
        self.payload = payload
        self.returned_message = returned_message


class TroughSegmentNotFound(TroughException):
    """Raised by read_url for an unprovisioned segment (client.py:166-169)."""


class TroughClient:
    def __init__(self, spark: SparkSession, root: str):
        self._store = SegmentStore(spark, root)

    @property
    def store(self) -> SegmentStore:
        return self._store

    # -- literal encoding (reference client.py:110-131; A10) -----------------

    @staticmethod
    def sql_value(x) -> str:
        from trough_spark.dialect import sql_value

        return sql_value(x)

    # -- URL surface (reference client.py:133-235).  There is no registry to
    # -- resolve against (SURVEY §4.3): every URL is the deterministic
    # -- trough-spark:// address of the segment in THIS store, so the
    # -- cache/nocache pairs collapse to the same lookup.

    def write_url(self, segment_id: str, schema_id: str = "default") -> str:
        return self._store.provision(segment_id, schema_id)["write_url"]

    write_url_nocache = write_url

    def read_url(self, segment_id: str) -> str:
        if segment_id not in self._store.list_segments():
            raise TroughSegmentNotFound(
                "no read url for segment %s; usually this means the "
                "segment hasn't been provisioned yet" % segment_id
            )
        return f"trough-spark://{self._store.root}#{segment_id}"

    read_url_nocache = read_url

    def read_urls_for_regex(self, regex: str) -> dict[str, str]:
        """{segment: url} for every readable segment matching ``regex``
        (reference client.py:171-188)."""
        return {
            seg: f"trough-spark://{self._store.root}#{seg}"
            for seg in self._store.segments_matching(regex)
        }

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

    async def async_read(self, segment_id: str, sql_tmpl: str, values=()) -> list[dict]:
        """Reference client.py:281-299 exposes an aiohttp read; here the
        engine is in-process, so the async variant runs the same read in a
        worker thread (keeps an asyncio caller's event loop unblocked)."""
        import asyncio

        return await asyncio.to_thread(self.read, segment_id, sql_tmpl, values)

    # -- write path (reference client.py:237-257) ----------------------------

    def write(
        self, segment_id: str, sql_tmpl: str, values=(), schema_id: str = "default"
    ) -> list[dict]:
        """Returns the rows any RETURNING clauses produced (SQLite 3.35+;
        empty list otherwise)."""
        from trough_spark.dialect import interpolate

        self._store.provision(segment_id, schema_id)
        return self._store.write(segment_id, interpolate(sql_tmpl, values))

    # -- registry / lifecycle (reference client.py:140-235) ------------------

    def schemas(self) -> list[str]:
        return self._store.list_schemas()

    def schema(self, schema_id: str) -> str | None:
        return self._store.get_schema_sql(schema_id)

    def register_schema(self, schema_id: str, sql: str) -> bool:
        return self._store.set_schema(schema_id, sql)

    def schema_exists(self, schema_id: str) -> bool:
        return self._store.get_schema_sql(schema_id) is not None

    def readable_segments(self, regex: str | None = None) -> list[dict]:
        segs = self._store.readable_segments()
        if regex is not None:
            import re as _re

            pat = _re.compile(regex)
            segs = [s for s in segs if pat.search(s["segment"])]
        return segs

    def readable_segments_matching(self, regex: str) -> list[str]:
        return self._store.segments_matching(regex)

    def promote(self, segment_id: str) -> dict:
        return self._store.promote(segment_id)

    def delete_segment(self, segment_id: str) -> None:
        self._store.delete_segment(segment_id)
