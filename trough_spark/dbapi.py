"""PEP 249 (DB-API 2.0) adapter over the engine (reference: trough/db_api.py).

The reference routes ``execute`` by the first six characters: 'select' → read
service, anything else → write service (db_api.py:93-115).  Same routing
here.  The reference's ``executemany`` is broken — it calls sqlparse without
importing it and evaluates ``len(query_types > 1)`` (a TypeError) at
db_api.py:98-105; this implementation fixes it as the survey prescribes
(SURVEY §2.A29).
"""

from __future__ import annotations

from trough_spark.client import TroughClient

apilevel = "2.0"
threadsafety = 1
paramstyle = "format"  # %s, matching the reference's printf templating


class Error(Exception):
    pass


class ProgrammingError(Error):
    pass


class TroughCursor:
    def __init__(self, client: TroughClient, segment_id: str, schema_id: str):
        self._client = client
        self._segment = segment_id
        self._schema = schema_id
        self._rows: list[tuple] = []
        self._pos = 0
        self.description = None
        self.rowcount = -1
        self.arraysize = 1
        self.lastrowid = None  # last AUTOINCREMENT id assigned by a write

    # -- execution -----------------------------------------------------------

    def execute(self, query: str, parameters=()):
        from trough_spark.dialect import QueryRejected

        try:
            if query.lstrip()[:6].lower() == "select":
                df = self._client.read_df(self._segment, query, parameters)
                cols = df.columns
                collected = df.collect()
                self.description = [(c, None, None, None, None, None, None) for c in cols]
                self._rows = [tuple(r[c] for c in cols) for r in collected]
                self.rowcount = len(self._rows)
            else:
                returned = self._client.write(
                    self._segment, query, parameters, schema_id=self._schema
                )
                if returned:
                    # RETURNING rows are fetchable exactly like a SELECT's
                    # (sqlite3 cursor semantics)
                    cols = list(returned[0])
                    self.description = [
                        (c, None, None, None, None, None, None) for c in cols
                    ]
                    self._rows = [tuple(r[c] for c in cols) for r in returned]
                    self.rowcount = len(self._rows)
                else:
                    self.description = None
                    self._rows = []
                    self.rowcount = -1
                # the store records the last autoincrement id it actually
                # assigned in this segment (sqlite3 lastrowid semantics:
                # unchanged by statements that assign none)
                la = self._client.store._last_auto.get(self._segment)
                if la is not None:
                    self.lastrowid = la
            self._pos = 0
        except QueryRejected as e:
            raise ProgrammingError(str(e)) from e
        return self

    def executemany(self, query: str, seq_of_parameters):
        # fixed per SURVEY §2.A29 (reference db_api.py:98-105 is broken)
        if query.lstrip()[:6].lower() == "select":
            raise ProgrammingError("executemany does not support SELECT statements")
        for parameters in seq_of_parameters:
            self.execute(query, parameters)
        return self

    # -- fetching -------------------------------------------------------------

    def fetchone(self):
        if self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchmany(self, size: int | None = None):
        size = size or self.arraysize
        out = self._rows[self._pos : self._pos + size]
        self._pos += len(out)
        return out

    def fetchall(self):
        out = self._rows[self._pos :]
        self._pos = len(self._rows)
        return out

    def __iter__(self):
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row

    def close(self):
        self._rows = []

    def setinputsizes(self, sizes):  # pragma: no cover - PEP249 no-op
        pass

    def setoutputsize(self, size, column=None):  # pragma: no cover - PEP249 no-op
        pass


class TroughConnection:
    def __init__(self, client: TroughClient, segment_id: str, schema_id: str):
        self._client = client
        self._segment = segment_id
        self._schema = schema_id

    def cursor(self) -> TroughCursor:
        return TroughCursor(self._client, self._segment, self._schema)

    def commit(self):
        pass  # every write script commits atomically (SURVEY §2.B17)

    def rollback(self):
        raise Error("rollback is not supported: writes are auto-committed per script")

    def close(self):
        pass


def connect(
    spark=None, root: str | None = None, segment_id: str = "default", schema_id: str = "default"
) -> TroughConnection:
    """reference: trough/db_api.py:141-142."""
    from trough_spark.session import get_spark

    client = TroughClient(spark or get_spark(), root or "/tmp/trough_spark_store")
    client.store.provision(segment_id, schema_id)
    return TroughConnection(client, segment_id, schema_id)
