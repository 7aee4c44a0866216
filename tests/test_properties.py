"""Property-based tests (hypothesis) for the dialect shim's pure functions —
beyond the reference's golden-only strategy (SURVEY §5)."""

from __future__ import annotations

import re
import sqlite3

from hypothesis import given, settings
from hypothesis import strategies as st

from trough_spark import dialect

# -- tokenizer roundtrip ------------------------------------------------------

sqlish = st.text(
    alphabet=st.sampled_from(list("abcXYZ0189_ '\"`.,;()*=<>%|-+/\n\t[]:?")), max_size=200
)


@given(sqlish)
@settings(max_examples=300, deadline=None)
def test_tokenize_render_roundtrip(s):
    assert dialect.render(dialect.tokenize(s)) == s


# -- statement splitting ------------------------------------------------------


@given(st.lists(st.sampled_from(["SELECT 1", "INSERT INTO t VALUES ('a;b')",
                                 "UPDATE t SET x = ';' WHERE 1", "-- note;\nSELECT 2"]),
                min_size=1, max_size=6))
@settings(max_examples=100, deadline=None)
def test_split_statement_count(stmts):
    script = ";\n".join(stmts) + ";"
    assert len(dialect.split_statements(script)) == len(stmts)


# -- GLOB translation vs real SQLite ------------------------------------------

glob_pat = st.text(alphabet=st.sampled_from(list("ab?*[]x-")), max_size=8)
subject = st.text(alphabet=st.sampled_from(list("abx-")), max_size=8)


@given(glob_pat, subject)
@settings(max_examples=300, deadline=None)
def test_glob_matches_sqlite(pattern, s):
    conn = sqlite3.connect(":memory:")
    try:
        expected = bool(
            conn.execute("SELECT ? GLOB ?", (s, pattern)).fetchone()[0]
        )
    except sqlite3.Error:
        return  # invalid pattern in sqlite: nothing to compare
    finally:
        conn.close()
    try:
        got = re.fullmatch(dialect.glob_to_regex(pattern)[1:-1], s) is not None
    except re.error:
        # sqlite tolerates some malformed classes we translate strictly;
        # only a mismatch on a VALID regex is a failure
        return
    assert got == expected, f"GLOB {pattern!r} on {s!r}"


# -- literal encoder vs real SQLite -------------------------------------------


@given(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-2**62, 2**62),
        # NUL excluded: python's sqlite3 driver rejects queries containing
        # it (the reference's HTTP-SQL path has the identical limitation)
        st.text(max_size=40).filter(lambda s: "\x00" not in s),
    )
)
@settings(max_examples=300, deadline=None)
def test_sql_value_roundtrip_sqlite(v):
    """Encoded literals must evaluate back to the original value in SQLite
    (booleans become 0/1, the reference's own encoding, client.py:116-117)."""
    lit = dialect.sql_value(v)
    if lit.startswith("timestamp'") or lit.startswith("date'"):
        return
    conn = sqlite3.connect(":memory:")
    got = conn.execute(f"SELECT {lit}").fetchone()[0]
    conn.close()
    if v is None:
        assert got is None
    elif isinstance(v, bool):
        assert got == int(v)
    else:
        assert got == v


# -- strftime format mapping --------------------------------------------------


@given(st.sampled_from(["%Y", "%m", "%d", "%H", "%M", "%S", "%Y-%m-%d", "%H:%M:%S", "%Y/%m"]))
@settings(max_examples=50, deadline=None)
def test_strftime_map_structure(fmt):
    out = dialect.strftime_format_to_spark(fmt)
    assert "%" not in out  # every directive translated


@given(st.integers(0, 65535), st.integers(0, 65535))
@settings(max_examples=200, deadline=None)
def test_morton_interleave_bijective(x, y):
    """zvalue's bit interleave must be exactly invertible — a collision
    would silently merge unrelated (x, y) cells in the layout."""
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    rx = ry = 0
    for i in range(16):
        rx |= ((z >> (2 * i)) & 1) << i
        ry |= ((z >> (2 * i + 1)) & 1) << i
    assert (rx, ry) == (x, y)


_URL_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._", min_size=1, max_size=8
)


@given(
    st.lists(_URL_CHARS, min_size=1, max_size=4),
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "utm_source", "utm_x", "ref", "id"]), _URL_CHARS),
        max_size=4,
    ),
)
@settings(max_examples=30, deadline=None)
def test_surt_canonicalize_idempotent_host_and_params(spark, labels, params):
    """Canonicalization must be a projection: applying it to a URL built
    from an already-canonical SURT host yields the same host, and tracking
    params never survive."""
    from trough_spark.operators.text import surt_canonicalize

    host = ".".join(labels)
    qs = "&".join(f"{k}={v}" for k, v in params)
    url = f"https://WWW.{host}/p?{qs}" if qs else f"https://WWW.{host}/p"
    df = spark.createDataFrame([(1, url)], "id bigint, url string")
    row = surt_canonicalize(df, "url").collect()[0]
    assert not row["host"].startswith("www.") or host.lower().startswith("www.")
    assert "utm_" not in row["surt"]
    # idempotence on the host: re-canonicalizing a URL rebuilt from the
    # canonical host changes nothing
    df2 = spark.createDataFrame([(1, f"https://{row['host']}/p?{qs}")], "id bigint, url string")
    row2 = surt_canonicalize(df2, "url").collect()[0]
    assert row2["host"] == row["host"]
    assert row2["surt"] == row["surt"]


@given(
    h=st.integers(min_value=1, max_value=9),
    w=st.integers(min_value=1, max_value=9),
    color=st.sampled_from([0, 2, 4, 6]),
    filt=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_codec_roundtrip_property(h, w, color, filt, seed):
    """Any 8-bit image encoded with any scanline filter decodes back to the
    exact pixel bytes (the stdlib codec is a REAL decoder, not a fake)."""
    import numpy as np

    from tests.test_multimodal import _encode_png
    from trough_spark.operators.multimodal import png_image_codec

    rng = np.random.RandomState(seed)
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    shape = (h, w) if channels == 1 else (h, w, channels)
    px = rng.randint(0, 256, size=shape, dtype=np.uint8)
    got = png_image_codec(_encode_png(px, color, filt))
    assert np.array_equal(got, px.reshape(-1))
