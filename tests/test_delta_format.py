"""storage_format='delta' spike (SURVEY §2.B15; VERDICT r4 item 6).

The write-parity end state maps OR REPLACE / ON CONFLICT / MERGE / UPDATE /
DELETE to Delta-transactional operations instead of the parquet rename-swap.
delta-spark is not installed in this container, so the Delta half of the
matrix is import-gated: tests in ``TestDeltaStore`` skip cleanly when the
package is absent and run the full store write-path contract when present.
The parquet half (including the explicit ``storage_format='parquet'``
spelling and the absent-package error contract) always runs.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from trough_spark.store import SegmentStore

DDL = (
    "CREATE TABLE kv (k INTEGER PRIMARY KEY, v TEXT);\n"
    "CREATE TABLE log (k INTEGER, note TEXT);\n"
)

_HAS_DELTA = importlib.util.find_spec("delta") is not None


def _exercise_write_path(store: SegmentStore) -> None:
    """The B15-B17 contract every storage format must satisfy."""
    store.set_schema("kv_schema", DDL)
    store.provision("seg1", "kv_schema")
    store.write(
        "seg1",
        "INSERT INTO kv VALUES (1, 'a');\n"
        "INSERT INTO kv VALUES (2, 'b');\n"
        "INSERT INTO log VALUES (1, 'first')",
    )
    # B16: UPDATE + DELETE rewrite
    store.write("seg1", "UPDATE kv SET v = 'B' WHERE k = 2; DELETE FROM log WHERE k = 1")
    # B15: upsert via OR REPLACE on the declared pk
    store.write("seg1", "INSERT OR REPLACE INTO kv VALUES (1, 'A2'), (3, 'c')")
    rows = {r["k"]: r["v"] for r in store.read("seg1", "SELECT k, v FROM kv")}
    assert rows == {1: "A2", 2: "B", 3: "c"}
    assert store.read("seg1", "SELECT count(*) AS n FROM log")[0]["n"] == 0
    # B17: mid-script failure rolls the WHOLE script back
    with pytest.raises(Exception):
        store.write(
            "seg1",
            "INSERT INTO kv VALUES (4, 'd');\n"
            "INSERT INTO nosuch VALUES (1)",
        )
    rows = {r["k"]: r["v"] for r in store.read("seg1", "SELECT k, v FROM kv")}
    assert rows == {1: "A2", 2: "B", 3: "c"}, "rollback must undo the partial insert"


def test_parquet_format_explicit(spark, tmp_path):
    store = SegmentStore(spark, str(tmp_path / "store"), storage_format="parquet")
    _exercise_write_path(store)


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="storage_format"):
        SegmentStore(spark, str(tmp_path / "s"), storage_format="orc")


@pytest.mark.skipif(_HAS_DELTA, reason="delta installed: error contract n/a")
def test_delta_requires_package(spark, tmp_path):
    with pytest.raises(ImportError, match="delta-spark"):
        SegmentStore(spark, str(tmp_path / "s"), storage_format="delta")


@pytest.mark.skipif(not _HAS_DELTA, reason="delta-spark not installed")
class TestDeltaStore:
    def test_delta_write_path_contract(self, spark, tmp_path):
        store = SegmentStore(spark, str(tmp_path / "dstore"), storage_format="delta")
        _exercise_write_path(store)

    def test_delta_cross_segment_surfaces(self, spark, tmp_path):
        """Round-6 single-partitioned-table layout: the cross-segment
        surfaces work under Delta — bulk_load is one partitioned log
        commit, table_df one log-pruned scan, read_many_df one plan."""
        import pyspark.sql.functions as F

        store = SegmentStore(spark, str(tmp_path / "dstore2"), storage_format="delta")
        store.set_schema("kv_schema", DDL)
        for seg in ("seg1", "seg2", "seg3"):
            store.provision(seg, "kv_schema")
            store.write(seg, f"INSERT INTO kv VALUES (1, '{seg}')")
        # bulk_load: one partitioned commit across segments
        extra = spark.createDataFrame(
            [(10, "x", "seg1"), (11, "y", "seg2")], "k int, v string, sid string"
        )
        segs = store.bulk_load("kv2", extra, segment_col="sid")
        assert segs == ["seg1", "seg2"]
        # table_df: one scan with the segment_id partition column
        tdf = store.table_df("kv")
        assert tdf.filter(F.col("segment_id") == "seg2").count() == 1
        assert tdf.count() == 3
        # read_many_df: regex fan-out as ONE query incl. global aggregation
        n = store.read_many_df(
            "^seg[12]$", "SELECT count(*) AS n FROM kv"
        ).collect()[0]["n"]
        assert n == 2
        # append_dataframe: incremental sibling
        more = spark.createDataFrame([(12, "z", "seg3")], "k int, v string, sid string")
        store.append_dataframe("kv2", more, segment_col="sid")
        assert store.table_df("kv2").count() == 3

    def test_delta_segment_isolation_and_delete(self, spark, tmp_path):
        """Per-segment reads prune to one partition of the shared table;
        delete_segment empties only that partition (log commit, no rmtree)."""
        store = SegmentStore(spark, str(tmp_path / "dstore3"), storage_format="delta")
        store.set_schema("kv_schema", DDL)
        for seg in ("a", "b"):
            store.provision(seg, "kv_schema")
            store.write(seg, f"INSERT INTO kv VALUES (7, '{seg}')")
        assert store.read("a", "SELECT v FROM kv")[0]["v"] == "a"
        store.delete_segment("a")
        assert store.table_df("kv").count() == 1
        assert store.read("b", "SELECT v FROM kv")[0]["v"] == "b"

    def test_delta_midscript_io_failure_rolls_back(self, spark, tmp_path, monkeypatch):
        """Port of test_store.test_midscript_io_failure_rolls_back to the
        Delta store (ADVICE r6): the first statement FLUSHES a real log
        commit before the injected IO failure, so the rollback exercises the
        delete-committed-files path, and the post-rollback reads run in the
        SAME SparkSession — proving the DeltaLog snapshot cache was
        invalidated (a stale cache would serve the rolled-back commit)."""
        from trough_spark.store import SegmentStore as SS

        store = SegmentStore(spark, str(tmp_path / "dstore_io"), storage_format="delta")
        store.set_schema("io", "create table a (k INTEGER); create table b (k INTEGER);")
        store.provision("seg_io", "io")
        store.write("seg_io", "INSERT INTO a VALUES (1); INSERT INTO b VALUES (10);")
        before_a = store.read("seg_io", "SELECT * FROM a ORDER BY k")
        before_b = store.read("seg_io", "SELECT * FROM b ORDER BY k")

        calls = {"n": 0}
        orig = SS._write_files

        def flaky(self, df, path, mode):
            calls["n"] += 1
            if calls["n"] == 2:  # table a's commit lands, table b's dies
                raise OSError("No space left on device (injected)")
            return orig(self, df, path, mode)

        monkeypatch.setattr(SS, "_write_files", flaky)
        with pytest.raises(OSError, match="injected"):
            store.write("seg_io", "INSERT INTO a VALUES (2); INSERT INTO b VALUES (20);")
        monkeypatch.setattr(SS, "_write_files", orig)
        assert calls["n"] >= 2, "first statement must have committed before the failure"

        assert store.read("seg_io", "SELECT * FROM a ORDER BY k") == before_a
        assert store.read("seg_io", "SELECT * FROM b ORDER BY k") == before_b
        store.write("seg_io", "INSERT INTO a VALUES (3);")
        assert len(store.read("seg_io", "SELECT * FROM a")) == 2

    def test_delta_rollback_across_checkpoint_boundary(
        self, spark, tmp_path, monkeypatch
    ):
        """A failing script whose first flush lands a CHECKPOINT_INTERVAL-th
        commit: the checkpoint parquet and the rewritten ``_last_checkpoint``
        hint appear MID-SCRIPT, so rollback must delete the commit and its
        checkpoint AND restore the hint's pre-script bytes — the journal's
        in-place-restore path (store.py ``inplace_contents``), which never
        executed before the double wrote checkpoints (round 8)."""
        import json as _json

        from delta import CHECKPOINT_INTERVAL
        from trough_spark.store import SegmentStore as SS

        store = SegmentStore(
            spark, str(tmp_path / "dstore_ckpt"), storage_format="delta"
        )
        store.set_schema(
            "ck", "create table a (k INTEGER); create table b (k INTEGER);"
        )
        store.provision("segck", "ck")
        log_dir = str(tmp_path / "dstore_ckpt" / "tables" / "a" / "_delta_log")
        hint = os.path.join(log_dir, "_last_checkpoint")

        def version() -> int:
            return max(
                int(f[:20]) for f in os.listdir(log_dir) if f.endswith(".json")
            )

        # drive table a's log to one commit before the SECOND checkpoint so
        # the pre-script state already has a _last_checkpoint to corrupt
        # (the delta table is created by the first flush, so write once
        # before polling the log)
        store.write("segck", "INSERT INTO a VALUES (0)")
        k = 0
        while version() < 2 * CHECKPOINT_INTERVAL - 1:
            k += 1
            store.write("segck", f"INSERT INTO a VALUES ({k})")
        assert _json.load(open(hint))["version"] == CHECKPOINT_INTERVAL
        hint_before = open(hint, "rb").read()
        rows_before = store.read("segck", "SELECT * FROM a ORDER BY k")

        calls = {"n": 0}
        orig = SS._write_files

        def flaky(self, df, path, mode):
            calls["n"] += 1
            if calls["n"] == 2:  # a's commit (v20 + checkpoint) lands, b dies
                raise OSError("No space left on device (injected)")
            return orig(self, df, path, mode)

        monkeypatch.setattr(SS, "_write_files", flaky)
        with pytest.raises(OSError, match="injected"):
            store.write(
                "segck", "INSERT INTO a VALUES (99); INSERT INTO b VALUES (1);"
            )
        monkeypatch.setattr(SS, "_write_files", orig)

        v = 2 * CHECKPOINT_INTERVAL
        assert not os.path.exists(os.path.join(log_dir, f"{v:020d}.json"))
        assert not os.path.exists(
            os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
        ), "mid-script checkpoint must be rolled back"
        assert open(hint, "rb").read() == hint_before, (
            "_last_checkpoint must be restored to its pre-script bytes"
        )
        assert store.read("segck", "SELECT * FROM a ORDER BY k") == rows_before
        # and the table still works past the boundary afterwards
        store.write("segck", "INSERT INTO a VALUES (100)")
        assert version() == v
        assert os.path.exists(os.path.join(log_dir, f"{v:020d}.checkpoint.parquet"))
        assert _json.load(open(hint))["version"] == v

    def test_delta_alter_add_column_default_backfills(self, spark, tmp_path):
        """ADVICE r6: the ALTER ADD COLUMN backfill reads the partition with
        the NEW schema before the rewrite lands — the Delta read path must
        null-fill the not-yet-existing column instead of raising."""
        store = SegmentStore(spark, str(tmp_path / "dstore_alter"), storage_format="delta")
        store.set_schema("al", "create table d (id INTEGER PRIMARY KEY, a INTEGER);")
        store.provision("defseg", "al")
        store.write(
            "defseg",
            "INSERT INTO d (a) VALUES (1);\n"
            "INSERT INTO d (a) VALUES (2);\n"
            "ALTER TABLE d ADD COLUMN g INTEGER DEFAULT 42;\n"
            "INSERT INTO d (a) VALUES (3);\n"
            "INSERT INTO d (a, g) VALUES (4, 9)",
        )
        got = [
            tuple(r.values())
            for r in store.read("defseg", "SELECT id, a, g FROM d ORDER BY id")
        ]
        assert got == [(1, 1, 42), (2, 2, 42), (3, 3, 42), (4, 4, 9)]

    def test_delta_merge_many_empty_batch_noop(self, spark, tmp_path):
        """ADVICE r6: an empty micro-batch must not index segments[0]."""
        store = SegmentStore(spark, str(tmp_path / "dstore_empty"), storage_format="delta")
        store.set_schema("kv_schema", DDL)
        store.provision("seg1", "kv_schema")
        store.write("seg1", "INSERT INTO kv VALUES (1, 'a')")
        empty = spark.createDataFrame([], "k int, v string, segment_id string")
        assert store.merge_many("kv", empty, on=["k"]) is True
        assert store.read("seg1", "SELECT count(*) AS n FROM kv")[0]["n"] == 1

    def test_delta_merge_many_executes(self, spark, tmp_path):
        """VERDICT r6 item 1: the native one-MERGE-per-batch path executes —
        updates + inserts across TWO segments land in ONE log commit, and
        the expression-dict when_matched drives whenMatchedUpdate(set=...)."""
        import os

        store = SegmentStore(spark, str(tmp_path / "dstore_mm"), storage_format="delta")
        store.set_schema("kv_schema", DDL)
        for seg in ("s1", "s2"):
            store.provision(seg, "kv_schema")
            store.write(
                seg, f"INSERT INTO kv VALUES (1, 'old-{seg}'), (2, 'keep-{seg}')"
            )
        src = spark.createDataFrame(
            [(1, "new-s1", "s1"), (3, "ins-s1", "s1"), (1, "new-s2", "s2")],
            "k int, v string, segment_id string",
        )
        log_dir = f"{store._table_path('kv')}/_delta_log"
        before = len(os.listdir(log_dir))
        assert store.merge_many("kv", src, on=["k"]) is True
        assert len(os.listdir(log_dir)) == before + 1, "one commit for the batch"
        assert {r["k"]: r["v"] for r in store.read("s1", "SELECT k, v FROM kv")} == {
            1: "new-s1", 2: "keep-s1", 3: "ins-s1"
        }
        assert {r["k"]: r["v"] for r in store.read("s2", "SELECT k, v FROM kv")} == {
            1: "new-s2", 2: "keep-s2"
        }
        # expression-dict merge: source./target. rewrite to the s./t. aliases
        src2 = spark.createDataFrame([(2, "X", "s1")], "k int, v string, segment_id string")
        assert store.merge_many(
            "kv", src2, on=["k"], when_matched={"v": "source.v || '-' || target.v"}
        ) is True
        assert {r["k"]: r["v"] for r in store.read("s1", "SELECT k, v FROM kv")} == {
            1: "new-s1", 2: "X-keep-s1", 3: "ins-s1"
        }

    def test_delta_streaming_upsert_sink(self, spark, tmp_path):
        """The streaming CDC sink's Delta end state executes: after the
        first (table-creating, per-segment fallback) batch, each micro-batch
        is ONE keyed MERGE against the single partitioned table; a full
        replay with a fresh checkpoint converges (exactly-once property)."""
        import json
        import os

        import pyspark.sql.functions as F

        from trough_spark.store import SegmentStore
        from trough_spark.streaming import events as E

        src_dir = tmp_path / "stream_src"
        src_dir.mkdir()
        for i in range(3):
            with open(src_dir / f"batch{i}.json", "w") as fh:
                for k in range(10):
                    fh.write(json.dumps({"k": 10 * i + k, "v": f"v{i}-{k}"}) + "\n")
        store = SegmentStore(spark, str(tmp_path / "dstore_stream"), storage_format="delta")
        store.set_schema("kv_schema", DDL)

        def run(ck: str) -> None:
            stream = (
                spark.readStream.schema("k int, v string")
                .option("maxFilesPerTrigger", 1)
                .json(str(src_dir))
            )
            enriched = stream.withColumn(
                "segment_id",
                F.concat(F.lit("d"), (F.col("k") % 2).cast("string")),
            )
            q = (
                E.upsert_to_segments(
                    enriched, store, "kv", str(tmp_path / ck),
                    keys=["k"], schema_id="kv_schema",
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        run("ck1")
        n1 = store.read_many_df("^d", "SELECT count(*) AS n FROM kv").collect()[0]["n"]
        assert n1 == 30
        commits_after_first = len(os.listdir(f"{store._table_path('kv')}/_delta_log"))
        run("ck2")  # replay: every batch is a keyed MERGE → state unchanged
        n2 = store.read_many_df("^d", "SELECT count(*) AS n FROM kv").collect()[0]["n"]
        assert n2 == n1
        commits_after_replay = len(os.listdir(f"{store._table_path('kv')}/_delta_log"))
        # replay ran entirely through merge_many: ONE commit per micro-batch
        assert commits_after_replay == commits_after_first + 3

    def test_delta_maintenance_parquet_scoped(self, spark, tmp_path):
        store = SegmentStore(spark, str(tmp_path / "dstore4"), storage_format="delta")
        store.set_schema("kv_schema", DDL)
        store.provision("seg1", "kv_schema")
        for op in (
            lambda: store.snapshot("seg1"),
            lambda: store.restore("seg1", "v0001"),
            lambda: store.compact("seg1"),
        ):
            with pytest.raises(NotImplementedError, match="parquet-scoped"):
                op()
