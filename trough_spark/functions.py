"""The three SQL functions the reference registers on every connection
(reference: trough/sync.py:40-86), re-expressed as native Spark expressions —
no Python UDFs on the hot path, so they stay inside whole-stage codegen at
any scale.

Exact reference semantics (trough/sync.py:41-82):

- ``REGEXP(expr, item)``: ``re.search``; NULL item → False (sync.py:43-44).
- ``SEEDCRAWLEDSTATUS(code)``: NULL → 'Not crawled (None)';
  300<=c<400 → 'Redirected'; c>=400 → 'Crawled (HTTP error <c>)';
  c>0 → 'Crawled'; c in (0,-5003,-5004) → 'Not crawled (queued)';
  c=-9998 → 'Not crawled (blocked by robots)'; else 'Not crawled (<c>)'.
- ``BUILDREDIRECTARRAY(url, status, hop_path, json_list)``: hop number =
  ``len(hop_path)``; pad the parsed JSON array with nulls to hop_no; REPLACE
  position hop_no-1 with ``{"seed": url, "status": SEEDCRAWLEDSTATUS(status)}``;
  re-serialize.  The native version serializes compact JSON (Spark ``to_json``)
  — the reference emits Python's spaced separators; byte format is documented
  as canonical-compact here, values identical.
"""

from __future__ import annotations

import json as _json
import re as _re

import pyspark.sql.functions as F
from pyspark.sql import Column, SparkSession

_ELEM = "array<struct<seed:string,status:string>>"


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def regexp(expr: Column | str, item: Column | str) -> Column:
    """``REGEXP(pattern, item)`` → boolean.  Reference arg order is
    (pattern, item) (trough/sync.py:41); Spark's rlike is item.rlike(pattern).
    NULL item → False, matching the reference's explicit guard."""
    return F.coalesce(F.regexp_like(_c(item), _c(expr)), F.lit(False))


def seed_crawled_status(status_code: Column | str) -> Column:
    """``SEEDCRAWLEDSTATUS(status_code)`` — pure CASE chain, no UDF
    (reference: trough/sync.py:52-70)."""
    c = _c(status_code)
    return (
        F.when(c.isNull(), "Not crawled (None)")
        .when((c >= 300) & (c < 400), "Redirected")
        .when(c >= 400, F.concat(F.lit("Crawled (HTTP error "), c.cast("string"), F.lit(")")))
        .when(c > 0, "Crawled")
        .when(c.isin(0, -5003, -5004), "Not crawled (queued)")
        .when(c == -9998, "Not crawled (blocked by robots)")
        .otherwise(F.concat(F.lit("Not crawled ("), c.cast("string"), F.lit(")")))
    )


def build_redirect_array(
    url: Column | str,
    status: Column | str,
    hop_path: Column | str,
    json_list: Column | str,
) -> Column:
    """``BUILDREDIRECTARRAY(url, status, hop_path, json_list)``
    (reference: trough/sync.py:72-82).  The reference fakes nested data as
    JSON text; here the accumulator is a real ``array<struct>`` manipulated
    with native slice/concat/array_repeat — JVM-side end to end — and
    serialized back to JSON text only at the boundary (SURVEY §1.2)."""
    u, s, hop, js = _c(url), _c(status), _c(hop_path), _c(json_list)
    arr = F.coalesce(F.from_json(js, _ELEM), F.expr(f"CAST(array() AS {_ELEM})"))
    hop_no = F.length(hop)
    pad_n = F.greatest(hop_no - F.size(arr), F.lit(0))
    null_elem = F.lit(None).cast("struct<seed:string,status:string>")
    padded = F.concat(arr, F.array_repeat(null_elem, pad_n))
    entry = F.struct(
        u.cast("string").alias("seed"), seed_crawled_status(s).alias("status")
    )
    head = F.slice(padded, 1, hop_no - 1)
    tail_len = F.size(padded) - hop_no
    tail = F.when(tail_len > 0, F.slice(padded, hop_no + 1, tail_len)).otherwise(
        F.expr(f"CAST(array() AS {_ELEM})")
    )
    return F.to_json(F.concat(head, F.array(entry), tail))


# SQL-text expansions used by the dialect shim (dialect.py) so translated
# SQLite queries calling these functions stay fully native/codegen'd.
SQL_EXPANSIONS = {
    "regexp": lambda a: f"coalesce({a[1]} RLIKE {a[0]}, false)",
    "seedcrawledstatus": lambda a: (
        f"(CASE WHEN {a[0]} IS NULL THEN 'Not crawled (None)' "
        f"WHEN {a[0]} >= 300 AND {a[0]} < 400 THEN 'Redirected' "
        f"WHEN {a[0]} >= 400 THEN concat('Crawled (HTTP error ', cast({a[0]} as string), ')') "
        f"WHEN {a[0]} > 0 THEN 'Crawled' "
        f"WHEN {a[0]} IN (0, -5003, -5004) THEN 'Not crawled (queued)' "
        f"WHEN {a[0]} = -9998 THEN 'Not crawled (blocked by robots)' "
        f"ELSE concat('Not crawled (', cast({a[0]} as string), ')') END)"
    ),
}


def register_all(spark: SparkSession) -> None:
    """Make the three functions callable from raw ``spark.sql`` text,
    mirroring ``setup_connection`` (reference: trough/sync.py:84-86).  The
    dialect shim inlines REGEXP / SEEDCRAWLEDSTATUS natively; these Python
    UDF registrations are the bug-compatible fallback for un-shimmed SQL and
    for BUILDREDIRECTARRAY's exact byte format (spaced JSON separators)."""

    def _regexp(p, x):
        if x is None:
            return False
        return _re.search(p, x) is not None

    spark.udf.register("REGEXP", _regexp, "boolean")

    def _scs(code):
        try:
            code = int(code)
        except TypeError:
            return "Not crawled (%s)" % code
        if 300 <= code < 400:
            return "Redirected"
        if code >= 400:
            return "Crawled (HTTP error %s)" % code
        if code > 0:
            return "Crawled"
        if code in (0, -5003, -5004):
            return "Not crawled (queued)"
        if code == -9998:
            return "Not crawled (blocked by robots)"
        return "Not crawled (%s)" % code

    spark.udf.register("SEEDCRAWLEDSTATUS", _scs, "string")

    def _bra(url, status, hop_path, json_list):
        hop_no = len(hop_path)
        lst = _json.loads(json_list) if json_list else []
        if hop_no > len(lst):
            lst.extend(None for _ in range(hop_no - len(lst)))
        lst[hop_no - 1] = {"seed": url, "status": _scs(status)}
        return _json.dumps(lst)

    spark.udf.register("BUILDREDIRECTARRAY", _bra, "string")

    def _glob_regex(pattern):
        # row-time glob-to-regex compile for NON-LITERAL GLOB patterns
        # (dialect.py rewrites `x GLOB expr` / `glob(expr, x)` to
        # `x RLIKE TROUGH_GLOB_REGEX(expr)` when the pattern can't be
        # compiled at translation time).  Reuses the property-tested
        # translator, so literal and column-valued patterns share one
        # semantics.  NULL pattern -> NULL regex -> NULL RLIKE, matching
        # SQLite's NULL threading.  Literal patterns never reach this UDF,
        # so the hot path stays codegen'd (asserted in test_plans).
        if pattern is None:
            return None
        from trough_spark.dialect import glob_to_regex

        return glob_to_regex(str(pattern))

    spark.udf.register("TROUGH_GLOB_REGEX", _glob_regex, "string")
