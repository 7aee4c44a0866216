"""Interactive shell (reference: trough/shell/__init__.py:36-474).

Commands mirrored from the reference REPL:

  CONNECT <segment> [<segment> ...]     connect to specific segments
  CONNECT MATCHING <regex>              connect to all segments matching
  SHOW TABLES | SCHEMAS | SEGMENTS | CONNECTIONS | CREATE TABLE <t>
  FORMAT table|json|pretty|raw          result rendering
  (query output pipes through $PAGER — less -nFSX — on a tty)
  SELECT ...                            fan-out to all connected segments
  PROMOTE <segment>                     flush/publish (already durable here)
  HELP / QUIT

The reference scatters SELECTs with asyncio and prints each segment's rows
separately with only a total row count (shell/__init__.py:236-262); this
shell does the same presentation, but through ONE Spark query — and because
it is one query, `SELECT ... GLOBAL` runs the statement with true
cross-segment semantics (global ORDER BY/GROUP BY), which the reference
could not do.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import subprocess
import sys

from trough_spark.client import TroughClient
from trough_spark.dialect import QueryRejected


def table_format(dictlist: list[dict]) -> str:
    """ASCII table with the reference's column ordering: 'id' first, then by
    max content width, alphabetical tiebreak (shell/__init__.py:66-100)."""
    if not dictlist:
        return "(no rows)"
    cols = list(dictlist[0].keys())
    widths = {c: max(len(str(c)), *(len(str(r.get(c))) for r in dictlist)) for c in cols}
    cols.sort(key=lambda c: (c != "id", -widths[c], c))
    sep = "+" + "+".join("-" * (widths[c] + 2) for c in cols) + "+"
    lines = [sep, "|" + "|".join(f" {c:<{widths[c]}} " for c in cols) + "|", sep]
    for r in dictlist:
        lines.append("|" + "|".join(f" {str(r.get(c)):<{widths[c]}} " for c in cols) + "|")
    lines.append(sep)
    return "\n".join(lines)


class TroughShell:
    def __init__(self, client: TroughClient, out=sys.stdout):
        self.client = client
        self.out = out
        self.connections: list[str] = []
        self.format = "table"
        # pager only makes sense on a real terminal (reference pipes query
        # display through $PAGER unconditionally; here it is tty-gated so
        # scripted/test use stays plain)
        self.use_pager = out is sys.stdout and sys.stdout.isatty()
        self.pager_pipe = None

    def do_infile_data(self, segment_id: str, path: str, table: str) -> int:
        """INFILE <path> INTO <table>: load a parquet/csv/jsonl data file
        into the connected segment.  Schema autodetection: parquet and JSON
        carry their own schema; CSV infers from header + content.  The
        table is registered on the segment if new (append_dataframe).
        Returns the row count loaded."""
        if not os.path.exists(path):
            raise OSError(f"no such file: {path}")
        store = self.client.store
        spark = store.spark
        ext = os.path.splitext(path)[1].lower()
        if ext in (".parquet", ".pq"):
            df = spark.read.parquet(path)
        elif ext == ".csv":
            df = spark.read.option("header", True).option("inferSchema", True).csv(path)
        elif ext in (".json", ".jsonl", ".ndjson"):
            df = spark.read.json(path)
        else:
            raise QueryRejected(f"unsupported data file type: {path!r}")
        from pyspark.sql import functions as F

        n = df.count()
        store.append_dataframe(table, df.withColumn("segment_id", F.lit(segment_id)))
        return n

    def emit(self, text: str) -> None:
        print(text, file=self.pager_pipe or self.out)

    @contextlib.contextmanager
    def pager(self):
        """Reference shell/__init__.py:289-307: query output pipes through
        $PAGER (default ``less -nFSX``); reentrant; BrokenPipeError (user
        quit the pager) is swallowed."""
        if self.pager_pipe is not None or not self.use_pager:
            yield
            return
        cmd = os.environ.get("PAGER") or "/usr/bin/less -nFSX"
        try:
            with subprocess.Popen(cmd, shell=True, stdin=subprocess.PIPE) as proc:
                with io.TextIOWrapper(proc.stdin, errors="backslashreplace") as pipe:
                    self.pager_pipe = pipe
                    yield
                proc.wait()
        except BrokenPipeError:
            pass  # user quit the pager
        finally:
            self.pager_pipe = None

    def render(self, rows: list[dict]) -> None:
        # reference display(): table → ascii, pretty → indented json,
        # json → compact json (shell/__init__.py:107-121); raw is ours
        if self.format == "table":
            self.emit(table_format(rows))
        elif self.format == "pretty":
            self.emit(json.dumps(rows, indent=2, default=str))
        elif self.format == "json":
            self.emit(json.dumps(rows, default=str))
        else:
            for r in rows:
                self.emit(str(tuple(r.values())))

    # -- commands ------------------------------------------------------------

    def do_connect(self, arg: str) -> None:
        parts = arg.split()
        if parts and parts[0].upper() == "MATCHING":
            segs = self.client.readable_segments_matching(" ".join(parts[1:]))
        else:
            segs = parts
        self.connections = list(dict.fromkeys(segs))
        self.emit(f"connected to {len(self.connections)} segment(s): {', '.join(self.connections)}")

    def do_show(self, arg: str) -> None:
        up = arg.strip().upper()
        if up == "SCHEMAS":
            self.render([{"schema": s} for s in self.client.schemas()])
        elif up == "SEGMENTS":
            self.render(self.client.readable_segments())
        elif up == "CONNECTIONS":
            self.render([{"segment": s} for s in self.connections])
        elif up == "TABLES":
            # reference rewrites to sqlite_master (shell/__init__.py:149-155);
            # here the segment's catalog is authoritative
            for seg in self.connections:
                tables = self.client.store._segment_tables(seg)
                self.emit(f"+++++ tables in segment {seg} +++++")
                self.render([{"name": t} for t in tables])
        elif up.startswith("CREATE TABLE"):
            name = arg.split()[-1]
            for seg in self.connections:
                ts = self.client.store._table_schema(seg, name)
                cols = ", ".join(f"{n} {t.simpleString()}" for n, t in ts.fields)
                self.emit(f"CREATE TABLE {name} ({cols})")
                break
        else:
            self.emit("usage: SHOW TABLES|SCHEMAS|SEGMENTS|CONNECTIONS|CREATE TABLE <t>")

    def do_select(self, stmt: str, global_merge: bool = False) -> None:
        if not self.connections:
            self.emit("not connected — use CONNECT <segment...>")
            return
        try:
            with self.pager():
                if global_merge:
                    regex = "^(" + "|".join(self.connections) + ")$"
                    rows = self.client.read_many(regex, stmt)
                    self.render(rows)
                    self.emit(f"total rows: {len(rows)}")
                    return
                total = 0
                for seg in self.connections:
                    rows = self.client.read(seg, stmt)
                    self.emit(f"+++++ results from segment {seg} +++++")
                    self.render(rows)
                    total += len(rows)
                self.emit(f"total rows: {total}")
        except QueryRejected as e:
            self.emit(f"error: {e}")

    def do_line(self, line: str) -> bool:
        """Process one input line; returns False to exit."""
        line = line.strip().rstrip(";")
        if not line:
            return True
        word, _, rest = line.partition(" ")
        cmd = word.upper()
        if cmd in ("QUIT", "EXIT"):
            return False
        if cmd == "CONNECT":
            self.do_connect(rest)
        elif cmd == "SHOW":
            self.do_show(rest)
        elif cmd == "FORMAT":
            if rest.lower() in ("table", "json", "pretty", "raw"):
                self.format = rest.lower()
                self.emit(f"format set to {self.format}")
            else:
                self.emit("usage: FORMAT table|json|pretty|raw")
        elif cmd == "PROMOTE":
            self.emit(json.dumps(self.client.promote(rest.strip()), default=str))
        elif cmd == "INFILE":
            # reference shell/__init__.py:329-351: execute a SQL script file
            # against the single connected segment.  Extension: `INFILE
            # <path> INTO <table>` loads a data file (parquet/csv/jsonl)
            # with schema autodetected by the Spark reader; the table is
            # registered on the segment if it doesn't exist yet.
            if len(self.connections) != 1:
                self.emit(
                    "not connected to exactly one segment"
                    if not self.connections
                    else "writing to multiple segments not supported"
                )
            else:
                m = re.match(r"^\s*(\S+)\s+INTO\s+(\w+)\s*$", rest, re.IGNORECASE)
                try:
                    if m:
                        n = self.do_infile_data(self.connections[0], m.group(1), m.group(2))
                        self.emit(f"OK ({n} rows into {m.group(2)})")
                    else:
                        with open(rest.strip()) as infile:
                            returned = self.client.store.write(
                                self.connections[0], infile.read()
                            )
                        if returned:
                            # RETURNING rows render like a SELECT's
                            self.render(returned)
                        self.emit("OK")
                except (OSError, QueryRejected) as e:
                    self.emit(f"error: {e}")
        elif cmd == "SHRED":
            # reference shell/__init__.py:380-403: SHRED SEGMENT id [id...]
            args = rest.split()
            if not args or args[0].upper() != "SEGMENT" or len(args) < 2:
                self.emit("usage: SHRED SEGMENT segment_id [segment_id...]")
            else:
                for seg in args[1:]:
                    try:
                        self.client.delete_segment(seg)
                        self.emit(f"shredded {seg}")
                    except KeyError:
                        self.emit(f"no such segment {seg!r}")
        elif cmd == "REGISTER":
            # REGISTER SCHEMA <id> <sql...>
            sub = rest.split(None, 2)
            if len(sub) == 3 and sub[0].upper() == "SCHEMA":
                self.client.register_schema(sub[1], sub[2])
                self.emit(f"schema {sub[1]} registered")
            else:
                self.emit("usage: REGISTER SCHEMA <id> <ddl sql>")
        elif cmd in ("SELECT", "WITH"):
            self.do_select(line)
        elif cmd == "GLOBAL":
            self.do_select(rest, global_merge=True)
        elif cmd == "HELP":
            self.emit(__doc__ or "")
        else:
            self.emit(f"unrecognized command {word!r} — HELP for help")
        return True

    def repl(self, prompt: str = "trough> ") -> None:  # pragma: no cover
        while True:
            try:
                line = input(prompt)
            except (EOFError, KeyboardInterrupt):
                break
            if not self.do_line(line):
                break


def main() -> None:  # pragma: no cover
    import argparse

    from trough_spark.session import get_spark

    ap = argparse.ArgumentParser(description="trough-spark shell")
    ap.add_argument("--root", default="/tmp/trough_spark_store")
    ap.add_argument("segments", nargs="*")
    args = ap.parse_args()
    shell = TroughShell(TroughClient(get_spark(app_name="trough-shell"), args.root))
    if args.segments:
        shell.do_connect(" ".join(args.segments))
    shell.repl()


if __name__ == "__main__":  # pragma: no cover
    main()
