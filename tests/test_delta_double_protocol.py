"""Conformance pins for the Delta protocol double itself (VERDICT r7 item 1).

The nine store-level Delta tests execute against ``tests/delta_double`` — a
double written by the same hands as the code under test, which could share
its blind spots.  These tests pin the double INDEPENDENTLY of the store:

1. **Golden-log replay**: the ``_delta_log`` commit files here are
   HAND-AUTHORED from the public protocol spec
   (https://github.com/delta-io/delta/blob/master/PROTOCOL.md — Actions:
   ``metaData``/``add``/``remove``; table state = ordered replay, adds
   minus removes) — NOT produced by the double's own write path.  If the
   double's replay drifts from the protocol, these fail even though every
   store test still passes.
2. **Strictness**: the round-7 double was lenient where real delta-spark
   raises; round 8 tightens it (schema mismatch without ``mergeSchema`` on
   append AND overwrite, incompatible same-name column types,
   ``overwriteSchema`` combined with ``replaceWhere``) and these tests pin
   each raise so the nine store tests prove real-Delta behavior, not
   double-shaped behavior.
3. **Write-path protocol shape**: a double-produced commit must be
   readable as protocol JSON (``%020d.json`` names, one action per line,
   protocol field names) — pinning the writer to the spec, not merely to
   the double's own reader.

Skipped when a REAL delta-spark is installed (then the store tests already
run against the real thing and these pins are moot).
"""

from __future__ import annotations

import json
import os

import pytest

delta = pytest.importorskip("delta")

if not getattr(delta, "__version__", "").endswith("trough-test-double"):
    pytest.skip("real delta-spark installed; double pins moot", allow_module_level=True)

from delta import (  # noqa: E402
    DeltaDoubleError,
    _SNAP_CACHE,
    is_delta_table,
    read_snapshot_df,
)
from delta.tables import DeltaTable  # noqa: E402


SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)

SCHEMA_V2_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            {"name": "w", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_commit(root: str, version: int, actions: list[dict]) -> None:
    d = os.path.join(root, "_delta_log")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{version:020d}.json"), "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")


def _parquet_file(spark, root: str, rel: str, rows, schema: str) -> None:
    """One single-file parquet at exactly ``root/rel`` (the path the golden
    log names)."""
    import glob
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(td, "out"))
        part = glob.glob(os.path.join(td, "out", "part-*.parquet"))[0]
        dst = os.path.join(root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copy(part, dst)


def _meta(schema_json: str, pcols: list[str] | None = None) -> dict:
    # hand-written per PROTOCOL.md §Change Metadata — field names and
    # nesting are the spec's, not the double's
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-000000000001",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json,
            "partitionColumns": pcols or [],
            "configuration": {},
        }
    }


def _add(path: str, pv: dict | None = None) -> dict:
    return {
        "add": {
            "path": path,
            "partitionValues": pv or {},
            "size": 1,
            "modificationTime": 1700000000000,
            "dataChange": True,
        }
    }


def _remove(path: str) -> dict:
    return {
        "remove": {
            "path": path,
            "deletionTimestamp": 1700000001000,
            "dataChange": True,
        }
    }


def test_golden_log_replay_adds_minus_removes(spark, tmp_path):
    """PROTOCOL.md: state at version N = replay of commits 0..N in order;
    an `add` activates a file, a later `remove` of the same path
    deactivates it; `remove` of an unknown path is a no-op."""
    root = str(tmp_path / "golden1")
    _parquet_file(spark, root, "f0.parquet", [(1, "a"), (2, "b")], "k long, v string")
    _parquet_file(spark, root, "f1.parquet", [(3, "c")], "k long, v string")
    _parquet_file(spark, root, "f2.parquet", [(4, "d")], "k long, v string")
    _write_commit(root, 0, [_meta(SCHEMA_JSON), _add("f0.parquet"), _add("f1.parquet")])
    _write_commit(
        root,
        1,
        [_remove("f1.parquet"), _remove("ghost.parquet"), _add("f2.parquet")],
    )
    assert is_delta_table(root)
    got = sorted(
        (r["k"], r["v"]) for r in read_snapshot_df(spark, root).collect()
    )
    assert got == [(1, "a"), (2, "b"), (4, "d")]
    # the double's DeltaTable surface reads the same replayed state
    got2 = sorted(
        (r["k"], r["v"])
        for r in DeltaTable.forPath(spark, root).toDF().collect()
    )
    assert got2 == got


def test_golden_log_rollback_by_commit_delete(spark, tmp_path):
    """Deleting the newest commit file (the store's listing-diff rollback)
    must restore the previous version's state WITHOUT any explicit cache
    clear — the snapshot cache is keyed by the set of log files."""
    root = str(tmp_path / "golden2")
    _parquet_file(spark, root, "f0.parquet", [(1, "a")], "k long, v string")
    _parquet_file(spark, root, "f1.parquet", [(2, "b")], "k long, v string")
    _write_commit(root, 0, [_meta(SCHEMA_JSON), _add("f0.parquet")])
    _write_commit(root, 1, [_remove("f0.parquet"), _add("f1.parquet")])
    assert [r["k"] for r in read_snapshot_df(spark, root).collect()] == [2]
    os.remove(os.path.join(root, "_delta_log", f"{1:020d}.json"))
    assert [r["k"] for r in read_snapshot_df(spark, root).collect()] == [1]


def test_golden_log_partitioned_replay(spark, tmp_path):
    """partitionValues + hive-style paths: the partition column comes back
    from the file path, and a remove prunes exactly its partition file."""
    root = str(tmp_path / "golden3")
    _parquet_file(spark, root, "p=x/f0.parquet", [(1,)], "k long")
    _parquet_file(spark, root, "p=y/f1.parquet", [(2,)], "k long")
    schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    _write_commit(
        root,
        0,
        [
            _meta(schema, ["p"]),
            _add("p=x/f0.parquet", {"p": "x"}),
            _add("p=y/f1.parquet", {"p": "y"}),
        ],
    )
    got = sorted((r["k"], r["p"]) for r in read_snapshot_df(spark, root).collect())
    assert got == [(1, "x"), (2, "y")]
    _write_commit(root, 1, [_remove("p=x/f0.parquet")])
    got = sorted((r["k"], r["p"]) for r in read_snapshot_df(spark, root).collect())
    assert got == [(2, "y")]


def test_golden_log_schema_evolution_null_fills(spark, tmp_path):
    """A later metaData action replaces the schema; files written before
    the new column was added null-fill it on read (mergeSchema union)."""
    root = str(tmp_path / "golden4")
    _parquet_file(spark, root, "f0.parquet", [(1, "a")], "k long, v string")
    _parquet_file(
        spark, root, "f1.parquet", [(2, "b", 0.5)], "k long, v string, w double"
    )
    _write_commit(root, 0, [_meta(SCHEMA_JSON), _add("f0.parquet")])
    _write_commit(root, 1, [_meta(SCHEMA_V2_JSON), _add("f1.parquet")])
    got = sorted(
        (r["k"], r["v"], r["w"]) for r in read_snapshot_df(spark, root).collect()
    )
    assert got == [(1, "a", None), (2, "b", 0.5)]


def _seed(spark, root: str):
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    df.write.format("delta").mode("overwrite").save(root)


def test_writer_emits_protocol_shaped_commits(spark, tmp_path):
    """The double's writer must produce log files a spec-reader would
    accept: %020d.json names, one JSON action per line, protocol field
    names, a parseable schemaString in the first commit."""
    root = str(tmp_path / "shape")
    _seed(spark, root)
    spark.createDataFrame([(2, "b")], "k long, v string").write.format(
        "delta"
    ).mode("append").save(root)
    names = sorted(os.listdir(os.path.join(root, "_delta_log")))
    assert names == [f"{0:020d}.json", f"{1:020d}.json"]
    actions0 = [
        json.loads(ln)
        for ln in open(os.path.join(root, "_delta_log", names[0]))
        if ln.strip()
    ]
    metas = [a["metaData"] for a in actions0 if "metaData" in a]
    assert len(metas) == 1
    parsed = json.loads(metas[0]["schemaString"])
    assert [f["name"] for f in parsed["fields"]] == ["k", "v"]
    assert metas[0]["partitionColumns"] == []
    adds = [a["add"] for a in actions0 if "add" in a]
    assert adds and all(
        a["path"].endswith(".parquet")
        and a["partitionValues"] == {}
        and a["dataChange"] is True
        for a in adds
    )
    actions1 = [
        json.loads(ln)
        for ln in open(os.path.join(root, "_delta_log", names[1]))
        if ln.strip()
    ]
    assert not any("metaData" in a for a in actions1), "append must not re-emit metaData"
    assert not any("remove" in a for a in actions1), "append must not remove files"


def test_append_schema_mismatch_raises_without_mergeschema(spark, tmp_path):
    root = str(tmp_path / "strict1")
    _seed(spark, root)
    widened = spark.createDataFrame([(2, "b", 1.5)], "k long, v string, w double")
    with pytest.raises(DeltaDoubleError, match="mergeSchema"):
        widened.write.format("delta").mode("append").save(root)
    # with the option it lands, and old rows null-fill
    widened.write.format("delta").mode("append").option(
        "mergeSchema", "true"
    ).save(root)
    got = sorted(
        (r["k"], r["w"]) for r in read_snapshot_df(spark, root).collect()
    )
    assert got == [(1, None), (2, 1.5)]


def test_overwrite_schema_mismatch_raises_without_mergeschema(spark, tmp_path):
    """Round-8 tightening: real Delta enforces schema on OVERWRITE too —
    the round-7 double silently merged, which could mask a store bug."""
    root = str(tmp_path / "strict2")
    _seed(spark, root)
    widened = spark.createDataFrame([(9, "z", 2.5)], "k long, v string, w double")
    with pytest.raises(DeltaDoubleError, match="mergeSchema"):
        widened.write.format("delta").mode("overwrite").save(root)


def test_incompatible_column_type_raises(spark, tmp_path):
    """Same-named column, different type: real Delta fails the merge; the
    round-7 double silently kept the old type."""
    root = str(tmp_path / "strict3")
    _seed(spark, root)
    retyped = spark.createDataFrame([(2, 7)], "k long, v long")
    with pytest.raises(DeltaDoubleError, match="incompatible"):
        retyped.write.format("delta").mode("append").option(
            "mergeSchema", "true"
        ).save(root)


def test_overwriteschema_replaces_and_rejects_replacewhere(spark, tmp_path):
    root = str(tmp_path / "strict4")
    _seed(spark, root)
    narrowed = spark.createDataFrame([(5,)], "k long")
    # without overwriteSchema: dropping a column is a mismatch... but the
    # double's merge is union-by-name, so a narrowed frame null-fills v —
    # matching real Delta's missing-nullable-column tolerance
    narrowed.write.format("delta").mode("overwrite").option(
        "overwriteSchema", "true"
    ).save(root)
    snap_df = read_snapshot_df(spark, root)
    assert snap_df.columns == ["k"], "overwriteSchema must REPLACE the schema"
    assert [r["k"] for r in snap_df.collect()] == [5]
    with pytest.raises(DeltaDoubleError, match="replaceWhere"):
        narrowed.write.format("delta").mode("overwrite").option(
            "overwriteSchema", "true"
        ).option("replaceWhere", "k = '5'").save(root)


def test_errorifexists_raises_on_existing_table(spark, tmp_path):
    root = str(tmp_path / "strict5")
    _seed(spark, root)
    with pytest.raises(DeltaDoubleError, match="exists"):
        spark.createDataFrame([(2, "b")], "k long, v string").write.format(
            "delta"
        ).save(root)


def test_snapshot_cache_is_keyed_by_log_file_set(spark, tmp_path):
    """The cache key must include every log file name so a new commit OR a
    deleted commit always misses — pinning the invalidation contract the
    store's rollback leans on."""
    root = str(tmp_path / "cache1")
    _seed(spark, root)
    read_snapshot_df(spark, root).collect()
    keys_before = {k for k in _SNAP_CACHE if k[0] == os.path.abspath(root)}
    assert keys_before
    spark.createDataFrame([(2, "b")], "k long, v string").write.format(
        "delta"
    ).mode("append").save(root)
    assert {r["k"] for r in read_snapshot_df(spark, root).collect()} == {1, 2}
    keys_after = {k for k in _SNAP_CACHE if k[0] == os.path.abspath(root)}
    assert keys_after - keys_before, "new commit must produce a new cache key"


# ---- round-8 additions: protocol action, checkpoints, commit races ----------


def test_commit0_carries_protocol_action(spark, tmp_path):
    """PROTOCOL.md: a new table's first commit must establish the protocol
    version.  The double writes minReaderVersion 1 / minWriterVersion 2 as
    the FIRST action of commit 0."""
    root = str(tmp_path / "proto1")
    _seed(spark, root)
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as fh:
        first = json.loads(fh.readline())
    assert first == {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def test_reader_refuses_future_protocol_version(spark, tmp_path):
    """PROTOCOL.md: a reader MUST refuse a table whose minReaderVersion it
    does not implement — silent misreads of e.g. deletion-vector tables
    are exactly the failure this clause exists to prevent."""
    root = str(tmp_path / "proto2")
    _parquet_file(spark, root, "f0.parquet", [(1, "a")], "k long, v string")
    _write_commit(
        root,
        0,
        [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
            _meta(SCHEMA_JSON),
            _add("f0.parquet"),
        ],
    )
    with pytest.raises(DeltaDoubleError, match="minReaderVersion"):
        read_snapshot_df(spark, root).collect()


def test_checkpoint_written_at_interval_and_actually_used(spark, tmp_path):
    """delta-spark writes a checkpoint every 10 commits plus the
    ``_last_checkpoint`` hint.  Proof the READER uses it: delete every
    JSON commit the checkpoint covers (real Delta's log cleanup does
    exactly this after the retention window) — the state must survive,
    reconstructed from checkpoint + tail commits alone."""
    from delta import last_checkpoint_hint

    root = str(tmp_path / "ckpt1")
    _seed(spark, root)  # version 0
    for i in range(2, 14):  # versions 1..12 -> checkpoint at 10
        spark.createDataFrame([(i, f"v{i}")], "k long, v string").write.format(
            "delta"
        ).mode("append").save(root)
    d = os.path.join(root, "_delta_log")
    assert os.path.exists(os.path.join(d, f"{10:020d}.checkpoint.parquet"))
    hint = last_checkpoint_hint(root)
    assert hint and hint["version"] == 10 and hint["size"] >= 3
    expect = {(1, "a")} | {(i, f"v{i}") for i in range(2, 14)}
    assert {
        (r["k"], r["v"]) for r in read_snapshot_df(spark, root).collect()
    } == expect
    # aggressive log cleanup: drop commits 0..10 (covered by the checkpoint)
    for v in range(0, 11):
        os.remove(os.path.join(d, f"{v:020d}.json"))
    assert {
        (r["k"], r["v"]) for r in read_snapshot_df(spark, root).collect()
    } == expect


def test_checkpoint_parquet_has_protocol_row_shape(spark, tmp_path):
    """The checkpoint is a parquet whose rows each carry exactly ONE of the
    protocol/metaData/add action columns (PROTOCOL.md §Checkpoints), with
    partitionValues as a string map — pinned by reading it with plain
    pyarrow, independent of the double's own reader."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "ckpt2")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    df.write.format("delta").mode("overwrite").partitionBy("v").save(root)
    for i in range(2, 12):
        spark.createDataFrame([(i, "a")], "k long, v string").write.format(
            "delta"
        ).mode("append").save(root)
    rows = pq.read_table(
        os.path.join(root, "_delta_log", f"{10:020d}.checkpoint.parquet")
    ).to_pylist()
    assert [set(k for k, v in r.items() if v is not None) for r in rows[:2]] == [
        {"protocol"},
        {"metaData"},
    ]
    adds = [r["add"] for r in rows if r["add"] is not None]
    assert adds and len(adds) == len(rows) - 2
    for a in adds:
        assert a["path"].endswith(".parquet")
        assert dict(a["partitionValues"]) == {"v": "a"}
    meta = next(r["metaData"] for r in rows if r["metaData"] is not None)
    parsed = json.loads(meta["schemaString"])
    assert [f["name"] for f in parsed["fields"]] == ["k", "v"]
    assert list(meta["partitionColumns"]) == ["v"]


def test_stale_last_checkpoint_hint_tolerated(spark, tmp_path):
    """PROTOCOL.md calls ``_last_checkpoint`` a HINT; after the store's
    script rollback it can name a checkpoint whose files were deleted.
    The reader must fall back to the checkpoints actually present."""
    root = str(tmp_path / "ckpt3")
    _seed(spark, root)
    spark.createDataFrame([(2, "b")], "k long, v string").write.format(
        "delta"
    ).mode("append").save(root)
    with open(os.path.join(root, "_delta_log", "_last_checkpoint"), "w") as fh:
        json.dump({"version": 99, "size": 3}, fh)
    assert {
        (r["k"], r["v"]) for r in read_snapshot_df(spark, root).collect()
    } == {(1, "a"), (2, "b")}


def test_commit_version_race_retries_to_next_version(spark, tmp_path):
    """PROTOCOL.md's optimistic concurrency: a writer that loses the
    put-if-absent race for version N must retry at N+1, never overwrite.
    Simulated by pre-creating the N.json the writer would claim."""
    root = str(tmp_path / "race1")
    _seed(spark, root)  # version 0
    blocker = os.path.join(root, "_delta_log", f"{1:020d}.json")
    with open(blocker, "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "SQUATTER"}}) + "\n")
    spark.createDataFrame([(2, "b")], "k long, v string").write.format(
        "delta"
    ).mode("append").save(root)
    names = sorted(
        f
        for f in os.listdir(os.path.join(root, "_delta_log"))
        if f.endswith(".json")
    )
    assert names == [f"{v:020d}.json" for v in (0, 1, 2)]
    with open(blocker) as fh:  # the squatter's file was not overwritten
        assert json.loads(fh.readline())["commitInfo"]["operation"] == "SQUATTER"
    assert {
        (r["k"], r["v"]) for r in read_snapshot_df(spark, root).collect()
    } == {(1, "a"), (2, "b")}


def test_concurrent_overwrite_conflict_raises(spark, tmp_path, monkeypatch):
    """Real delta-spark's OptimisticTransaction: an OVERWRITE computed
    from a stale snapshot must RAISE when another writer committed data
    in between (its removes describe files it read) — the round-9 double
    blindly retried and silently clobbered the concurrent write (round 10,
    VERDICT r9 item 6).  The stale read is injected by pinning _replay to
    the pre-race snapshot, exactly the two-writer interleave."""
    import delta as dd

    root = str(tmp_path / "ccw")
    _seed(spark, root)  # version 0
    stale = dd._replay(root)
    assert stale.version == 0
    # concurrent writer lands version 1 (an append carrying an add action)
    spark.createDataFrame([(2, "b")], "k long, v string").write.format(
        "delta"
    ).mode("append").save(root)
    monkeypatch.setattr(dd, "_replay", lambda r: stale)
    with pytest.raises(DeltaDoubleError, match="ConcurrentWrite"):
        spark.createDataFrame([(9, "z")], "k long, v string").write.format(
            "delta"
        ).mode("overwrite").save(root)
    monkeypatch.undo()
    # the concurrent writer's data survived — nothing was clobbered
    assert {(r["k"], r["v"]) for r in read_snapshot_df(spark, root).collect()} == {
        (1, "a"),
        (2, "b"),
    }


def test_blind_append_vs_concurrent_commits(spark, tmp_path, monkeypatch):
    """Real delta-spark's logical conflict classes for a BLIND APPEND from
    a stale snapshot: append-vs-append retries and WINS (the protocol's
    sanctioned case, already pinned by the race test), but an intervening
    metaData change raises MetadataChangedException (round 10)."""
    import delta as dd

    root = str(tmp_path / "ccm")
    _seed(spark, root)  # version 0
    stale = dd._replay(root)
    # append-vs-append from a stale snapshot: allowed, both rows land
    monkeypatch.setattr(dd, "_replay", lambda r: stale)
    spark.createDataFrame([(2, "b")], "k long, v string").write.format(
        "delta"
    ).mode("append").save(root)
    monkeypatch.undo()
    assert {r["k"] for r in read_snapshot_df(spark, root).collect()} == {1, 2}
    # concurrent metadata change (overwriteSchema commit at version 2)
    stale = dd._replay(root)
    spark.createDataFrame([(3,)], "k long").write.format("delta").mode(
        "overwrite"
    ).option("overwriteSchema", "true").save(root)
    monkeypatch.setattr(dd, "_replay", lambda r: stale)
    with pytest.raises(DeltaDoubleError, match="MetadataChanged"):
        spark.createDataFrame([(4, "d")], "k long, v string").write.format(
            "delta"
        ).mode("append").save(root)


def test_golden_checkpoint_replay(spark, tmp_path):
    """The checkpoint READER pinned against a HAND-AUTHORED checkpoint
    parquet (built with plain pyarrow from PROTOCOL.md §Checkpoints, not by
    the double's writer) plus one tail JSON commit: state must be
    checkpoint adds, minus a tail remove, plus a tail add."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "goldenckpt")
    for rel, rows in (
        ("f0.parquet", [(1, "a")]),
        ("f1.parquet", [(2, "b")]),
        ("f2.parquet", [(3, "c")]),
    ):
        _parquet_file(spark, root, rel, rows, "k long, v string")
    d = os.path.join(root, "_delta_log")
    os.makedirs(d, exist_ok=True)
    # the checkpoint covers versions 0..1: files f0 + f1 active
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    rows = [
        {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": None,
            "add": None,
        },
        {
            "protocol": None,
            "metaData": {
                "id": "gold-0001",
                "schemaString": SCHEMA_JSON,
                "partitionColumns": [],
                "createdTime": 1700000000000,
            },
            "add": None,
        },
    ] + [
        {
            "protocol": None,
            "metaData": None,
            "add": {
                "path": p,
                "partitionValues": [],
                "size": 1,
                "modificationTime": 1700000000000,
                "dataChange": False,
            },
        }
        for p in ("f0.parquet", "f1.parquet")
    ]
    pq.write_table(
        pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("protocol", proto_t), ("metaData", meta_t), ("add", add_t)]
            ),
        ),
        os.path.join(d, f"{1:020d}.checkpoint.parquet"),
    )
    with open(os.path.join(d, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 1, "size": len(rows)}, fh)
    # JSON commits: only 1 (could be cleaned up pre-checkpoint: omitted 0)
    # and the tail commit 2
    _write_commit(root, 1, [_add("f1.parquet")])  # duplicate-add: idempotent
    _write_commit(root, 2, [_remove("f0.parquet"), _add("f2.parquet")])
    got = sorted(
        (r["k"], r["v"]) for r in read_snapshot_df(spark, root).collect()
    )
    assert got == [(2, "b"), (3, "c")]
