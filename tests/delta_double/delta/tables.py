"""``delta.tables`` surface of the TEST-ONLY contract double (see
``delta/__init__.py`` for scope and documented deviations).

Implements exactly the builder subset the engine drives
(`trough_spark/store.py` ``merge_many``): ``DeltaTable.forPath(...)
.alias(t).merge(src.alias(s), cond).whenMatchedUpdateAll()/
whenMatchedUpdate(set=...)/whenNotMatchedInsertAll().execute()``.

Merge semantics follow the public MERGE INTO contract: a full-outer join
of target and source on the condition; matched rows take the update
clause (or stay put without one), target-only rows pass through,
source-only rows insert when ``whenNotMatchedInsertAll`` was declared.
The double rewrites the whole table in one overwrite commit — real Delta
rewrites only touched files (a perf, not correctness, difference)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from . import DeltaDoubleError, _delta_save, _replay, is_delta_table, read_snapshot_df

__all__ = ["DeltaTable", "DeltaMergeBuilder"]


class DeltaTable:
    def __init__(self, spark, path: str, alias: str | None = None):
        self._spark = spark
        self._path = path
        self._alias = alias

    @classmethod
    def forPath(cls, sparkSession, path: str) -> "DeltaTable":
        if not is_delta_table(path):
            raise DeltaDoubleError(f"{path!r} is not a Delta table")
        return cls(sparkSession, path)

    @classmethod
    def isDeltaTable(cls, sparkSession, identifier: str) -> bool:
        return is_delta_table(identifier)

    def alias(self, aliasName: str) -> "DeltaTable":
        return DeltaTable(self._spark, self._path, aliasName)

    def toDF(self):
        return read_snapshot_df(self._spark, self._path)

    def merge(self, source, condition) -> "DeltaMergeBuilder":
        return DeltaMergeBuilder(self, source, condition)


class DeltaMergeBuilder:
    def __init__(self, table: DeltaTable, source, condition):
        self._table = table
        self._source = source
        self._cond = condition if isinstance(condition, str) else None
        if self._cond is None:
            raise DeltaDoubleError("double supports string merge conditions only")
        self._matched: tuple[str, dict | None] | None = None  # (kind, set)
        self._insert_all = False

    def whenMatchedUpdateAll(self, condition=None) -> "DeltaMergeBuilder":
        if condition is not None:
            raise DeltaDoubleError("double: conditional matched clauses unsupported")
        self._matched = ("update_all", None)
        return self

    def whenMatchedUpdate(self, condition=None, set=None) -> "DeltaMergeBuilder":
        if condition is not None or not set:
            raise DeltaDoubleError("double: whenMatchedUpdate needs set=, no condition")
        self._matched = ("update_set", dict(set))
        return self

    def whenNotMatchedInsertAll(self, condition=None) -> "DeltaMergeBuilder":
        if condition is not None:
            raise DeltaDoubleError("double: conditional insert clauses unsupported")
        self._insert_all = True
        return self

    def execute(self) -> None:
        spark, path = self._table._spark, self._table._path
        snap = _replay(path)
        if snap is None:
            raise DeltaDoubleError(f"{path!r} is not a Delta table")
        t_alias = self._table._alias or "t"
        quals = set(re.findall(r"(\w+)\s*\.", self._cond))
        s_aliases = [q for q in quals if q != t_alias]
        s_alias = s_aliases[0] if s_aliases else "s"

        tgt = read_snapshot_df(spark, path)
        t2 = tgt.select("*", F.lit(True).alias("__dd_tp")).alias(t_alias)
        s2 = self._source.select("*", F.lit(True).alias("__dd_sp")).alias(s_alias)
        j = t2.join(s2, F.expr(self._cond), "full_outer")
        if not self._insert_all:
            j = j.filter(F.col("__dd_tp").isNotNull())
        matched = F.col("__dd_tp").isNotNull() & F.col("__dd_sp").isNotNull()

        src_by_lower = {c.lower(): c for c in self._source.columns}
        kind, sets = self._matched or ("none", None)
        sets_by_lower = {k.lower(): v for k, v in (sets or {}).items()}
        out_cols = []
        for f in snap.schema.fields:
            t_c = F.col(f"{t_alias}.`{f.name}`")
            sc_name = src_by_lower.get(f.name.lower())
            s_c = F.col(f"{s_alias}.`{sc_name}`") if sc_name else F.lit(None)
            if kind == "update_all":
                upd = s_c if sc_name else t_c
            elif kind == "update_set":
                expr = sets_by_lower.get(f.name.lower())
                upd = F.expr(expr) if expr is not None else t_c
            else:
                upd = t_c
            out_cols.append(
                F.when(matched, upd)
                .when(F.col("__dd_tp").isNotNull(), t_c)
                .otherwise(s_c)
                .cast(f.dataType)
                .alias(f.name)
            )
        out = j.select(out_cols)
        _delta_save(out, path, "overwrite", snap.partition_cols, {})
