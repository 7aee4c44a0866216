"""Cardinality / frequency sketches: HyperLogLog and count-min.

The canonical 100 TB answers to "how many distinct X" and "how often does
each hot key occur" when exact answers would shuffle the full key set:
both sketches reduce to a **map-side-combinable aggregate over a
constant-size state** (m registers / d*w cells), so a 1000-executor scan
merges partial sketches for free inside partial aggregation — no key
shuffle, no driver state.

Determinism contract (required by the DuckDB oracle gate): every hash is
md5-derived (`dedup.portable_hash`, 60-bit), all bucket/rank math is pure
integer bit arithmetic (shifts/masks + exact `length(bin(w))` instead of
floating log2), and register sums are carried in DECIMAL(38,0) so neither
engine rounds or overflows.  The only floats are the final estimate
expressions, computed from identical exact inputs and rounded before
output.

Reference parity: the reference engine has no sketches (SQLite's
count(distinct) is exact and single-node; /root/reference/trough/read.py
passes it through) — these are part of the training-data-pipeline surface
this engine adds beyond the reference.

HLL: Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007) — alpha_m bias constant and
the small-range linear-counting correction.
Count-min: Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications" (J. Algorithms 2005).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from trough_spark.operators.dedup import portable_hash

HASH_BITS = 60  # portable_hash yields values in [0, 2^60)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
def hll_alpha(m: int) -> float:
    """Bias-correction constant alpha_m (HLL paper, section 4)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, col, group_by=None, p: int = 7
) -> DataFrame:
    """Dense HLL register vector: one row per (group,) bucket in [0, 2^p),
    column ``r`` = max rank (0 for never-hit buckets).

    The aggregate is max() — associative and commutative, so Spark computes
    per-partition partial maxima map-side and shuffles at most
    groups x 2^p rows regardless of input size.  Never-hit buckets are
    restored by a broadcast join against ``spark.range(2^p)`` so the
    estimate formula sees all m registers.
    """
    m = 1 << p
    v = F.col(col) if isinstance(col, str) else col
    gb = [group_by] if isinstance(group_by, str) else list(group_by or [])
    h = portable_hash(v.cast("string"))
    wbits = HASH_BITS - p
    df = df.where(v.isNotNull()).select(
        *gb,
        h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
        F.shiftright(h, p).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(F.col("w")))
    )
    hit = df.select(*gb, "bucket", rho.alias("rho")).groupBy(*gb, "bucket").agg(
        F.max("rho").alias("r")
    )
    buckets = df.sparkSession.range(m).withColumnRenamed("id", "bucket")
    if gb:
        groups = df.select(*gb).distinct()
        full = groups.crossJoin(F.broadcast(buckets))
    else:
        full = buckets
    return (
        full.join(hit, [*gb, "bucket"], "left")
        .select(*gb, "bucket", F.coalesce(F.col("r"), F.lit(0)).alias("r"))
    )


def hll_estimate(
    df: DataFrame, col, group_by=None, p: int = 7, out: str = "est_distinct"
) -> DataFrame:
    """Distinct-count estimate per group, rounded to 3 decimals.

    Register sum is exact: each register contributes 2^(HASH_BITS - r) as a
    DECIMAL(38,0) (max m * 2^60 ~ 1.5e20, well inside 38 digits), and the
    raw estimate alpha * m^2 * 2^60 / S divides exact quantities.  The
    small-range linear-counting correction m * ln(m / V) applies when the
    raw estimate is under 2.5m and empty registers remain.
    """
    m = 1 << p
    gb = [group_by] if isinstance(group_by, str) else list(group_by or [])
    regs = hll_registers(df, col, group_by=group_by, p=p)
    # shiftleft's Python wrapper takes only int literals; the SQL form
    # accepts a column-valued shift amount
    term = F.expr(f"CAST(shiftleft(1L, {HASH_BITS} - r) AS DECIMAL(38,0))")
    agg = regs.groupBy(*gb).agg(
        F.sum(term).alias("_s"),
        F.sum(F.when(F.col("r") == 0, 1).otherwise(0)).alias("_v"),
    )
    scale = float(m) * float(m) * float(1 << HASH_BITS) * hll_alpha(m)
    raw = F.lit(scale) / F.col("_s").cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("_v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_v").cast("double")),
    ).otherwise(raw)
    return agg.select(*gb, F.round(est, 3).alias(out))


def hll_oracle_sql(
    source_sql: str, col: str, group_by: str | None = None, p: int = 7
) -> str:
    """DuckDB SQL computing the identical estimate (same hash, same exact
    integer register math) for the driver's oracle gate."""
    m = 1 << p
    wbits = HASH_BITS - p
    alpha = hll_alpha(m)
    scale = float(m) * float(m) * float(1 << HASH_BITS) * alpha
    gcol = group_by
    gsel = f"{gcol}, " if gcol else ""
    gby = f"GROUP BY {gcol}" if gcol else ""
    gjoin = f"CROSS JOIN (SELECT DISTINCT {gcol} FROM hashed) g" if gcol else ""
    gcond = f"AND h.{gcol} = b.{gcol}" if gcol else ""
    bsel = f"g.{gcol}, " if gcol else ""
    return f"""
    WITH src AS ({source_sql}),
    hashed AS (
      SELECT {gsel}
             CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
      FROM src WHERE {col} IS NOT NULL
    ),
    ranked AS (
      SELECT {gsel} h & {m - 1} AS bucket,
             CASE WHEN (h >> {p}) = 0 THEN {wbits + 1}
                  ELSE {wbits + 1} - length(bin(h >> {p})) END AS rho
      FROM hashed
    ),
    hit AS (
      SELECT {gsel} bucket, MAX(rho) AS r FROM ranked GROUP BY {gsel} bucket
    ),
    buckets AS (
      SELECT {bsel} t.range AS bucket FROM range({m}) t {gjoin}
    ),
    regs AS (
      SELECT {('b.' + gcol + ', ') if gcol else ''} b.bucket,
             COALESCE(h.r, 0) AS r
      FROM buckets b LEFT JOIN hit h ON h.bucket = b.bucket {gcond}
    ),
    agg AS (
      SELECT {gsel}
             SUM(CAST((1::BIGINT << ({HASH_BITS} - r)) AS DECIMAL(38,0))) AS s,
             SUM(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS v
      FROM regs {gby}
    )
    SELECT {gsel}
           ROUND(CASE WHEN ({scale!r} / CAST(s AS DOUBLE)) <= {2.5 * m}
                       AND v > 0
                      THEN {float(m)!r} * ln({float(m)!r} / CAST(v AS DOUBLE))
                      ELSE {scale!r} / CAST(s AS DOUBLE) END, 3) AS est_distinct
    FROM agg
    """


# ---------------------------------------------------------------------------
# Count-min
# ---------------------------------------------------------------------------
def cms_build(
    df: DataFrame,
    key,
    depth: int = 3,
    width: int = 256,
    weight: Column | None = None,
) -> DataFrame:
    """Count-min sketch as a DataFrame of (row, bucket, cnt): depth
    independent md5 hash rows, each folding every key occurrence into
    ``width`` counters.

    Output is depth x width rows no matter the input size — a groupBy whose
    partial aggregation does all the work map-side.  Sketches from
    different inputs union+re-aggregate to merge.
    """
    k = (F.col(key) if isinstance(key, str) else key).cast("string")
    w = weight if weight is not None else F.lit(1).cast("bigint")
    rows = df.where(k.isNotNull()).select(
        k.alias("_k"), w.alias("_w"), F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row")
    )
    bucket = portable_hash(
        F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_k"))
    ).bitwiseAND(F.lit(width - 1))
    return (
        rows.select("row", bucket.alias("bucket"), "_w")
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    depth: int = 3,
    width: int = 256,
    out: str = "est_count",
) -> DataFrame:
    """Point-query estimates: for each key, min over its depth counters —
    an upper bound on the true count (classic CMS guarantee).  The sketch
    is depth*width rows, so the join side is always broadcast."""
    probes = keys.select(
        F.col(key),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    )
    bucket = portable_hash(
        F.concat(F.col("row").cast("string"), F.lit(":"), F.col(key).cast("string"))
    ).bitwiseAND(F.lit(width - 1))
    probes = probes.select(F.col(key), "row", bucket.alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out)
    )


def cms_oracle_sql(
    source_sql: str, key: str, depth: int = 3, width: int = 256
) -> str:
    """DuckDB SQL producing identical (key, est_count) pairs for every
    distinct key in the source."""
    return f"""
    WITH src AS ({source_sql}),
    occ AS (
      SELECT CAST({key} AS VARCHAR) AS k FROM src WHERE {key} IS NOT NULL
    ),
    probes AS (
      SELECT k, t.range AS row,
             CAST(('0x' || substr(md5(CAST(t.range AS VARCHAR) || ':' || k), 1, 15))
                  AS BIGINT) & {width - 1} AS bucket
      FROM occ CROSS JOIN range({depth}) t
    ),
    sketch AS (
      SELECT row, bucket, COUNT(*) AS cnt FROM probes GROUP BY row, bucket
    ),
    key_probes AS (
      SELECT DISTINCT k, row, bucket FROM probes
    )
    SELECT kp.k AS {key}, MIN(s.cnt) AS est_count
    FROM key_probes kp JOIN sketch s ON s.row = kp.row AND s.bucket = kp.bucket
    GROUP BY kp.k
    """


# ---------------------------------------------------------------------------
# Equi-depth histogram without a global sort
# ---------------------------------------------------------------------------
def equidepth_histogram(
    df: DataFrame, val_col: str, id_col: str, n_buckets: int = 10
) -> DataFrame:
    """Exact equi-depth histogram: every row gets a global rank under the
    total order (value, id), bucket = (rank-1)*n_buckets DIV total, then
    per-bucket (n_rows, lo, hi, sum_val).

    The naive form is ntile() over a GLOBAL window — a single-reducer sort
    that dies at 100 TB.  This one decomposes the rank: (# rows with a
    strictly smaller value) comes from a cumulative table over DISTINCT
    values (tiny — windowed on one partition but O(distinct), not O(rows),
    then broadcast), and the within-value position from a window
    PARTITIONED BY value (parallel).  Two narrow shuffles, both O(rows)
    hash-partitioned; nothing global touches row-scale data.  All
    arithmetic is integer, so the single-node oracle reproduces every
    bucket boundary exactly."""
    from pyspark.sql import Window

    rows = df.select(F.col(val_col).alias("v"), F.col(id_col).alias("id")).where(
        F.col("v").isNotNull()
    )
    counts = rows.groupBy("v").agg(F.count(F.lit(1)).alias("_c"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = counts.select(
        "v", F.coalesce(F.sum("_c").over(wv), F.lit(0)).alias("_n_less")
    )
    total = counts.agg(F.sum("_c").alias("_total"))
    win = Window.partitionBy("v").orderBy("id")
    ranked = (
        rows.withColumn("_rn", F.row_number().over(win))
        .join(F.broadcast(cum), "v")
        .crossJoin(F.broadcast(total))
        .select(
            "v",
            "id",
            (F.col("_n_less") + F.col("_rn") - 1).alias("_rank0"),
            "_total",
        )
    )
    bucketed = ranked.select(
        "v",
        F.expr(f"CAST((_rank0 * {n_buckets}) DIV _total AS INT)").alias("bucket"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.sum(F.col("v").cast("bigint")).alias("sum_val"),
        )
        .orderBy("bucket")
    )


def equidepth_oracle_sql(
    source_sql: str, val: str, id_: str, n_buckets: int = 10
) -> str:
    """DuckDB equivalent — the oracle may use the lazy global window (it is
    single-node anyway); the bucket formula matches bit-for-bit."""
    return f"""
    ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v, id) - 1 AS rank0,
             COUNT(*) OVER () AS total
      FROM (SELECT {val} AS v, {id_} AS id FROM ({source_sql}) WHERE {val} IS NOT NULL)
    ),
    hist AS (
      SELECT CAST((rank0 * {n_buckets}) // total AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             MIN(v) AS lo, MAX(v) AS hi,
             CAST(SUM(CAST(v AS BIGINT)) AS BIGINT) AS sum_val
      FROM ranked GROUP BY 1
    )
    """


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) bottom-k sketch
# ---------------------------------------------------------------------------
def kmv_sample(df: DataFrame, key: Column, k: int = 256) -> DataFrame:
    """The k rows whose 60-bit portable hash of ``key`` is smallest — the
    classic KMV / bottom-k sketch (Bar-Yossef et al. 2002; Beyer et al.
    2007).  Deterministic (md5-keyed), MERGEABLE (the bottom-k of a union
    is the bottom-k of the per-partition bottom-k's), and tiny: k rows
    stand in for the whole table.

    Scale: Spark plans ORDER BY h LIMIT k as per-partition top-k
    (TakeOrdered) — every partition forwards at most k (hash, row) pairs
    to one merger, no full sort, no full shuffle.  That per-partition
    combine IS the sketch merge, which is why the same operator serves a
    1000-executor scan: 1000 × k rows cross the wire, not the corpus.
    """
    return df.select(portable_hash(key.cast("string")).alias("kmv_h"), "*").orderBy(
        "kmv_h"
    ).limit(k)


def kmv_quantiles(
    df: DataFrame, key: Column, value_col: str, k: int = 256, n_buckets: int = 10
) -> DataFrame:
    """Approximate quantile boundaries of ``value_col`` from a KMV bottom-k
    sample: boundary q (0..n_buckets) is the sample's exact order statistic
    at rank round(q * (n-1) / n_buckets) + 1.  The k-th smallest hash also
    yields the KMV distinct-count estimate (k-1) / (h_k / 2^60), carried on
    every row (rounded to 3 decimals; exact integer-and-hash derived, so
    cross-engine deterministic).

    Returns (q, boundary, est_ndv) with n_buckets+1 rows.  Unlike the exact
    equi-depth histogram (full-data ntile) this costs one bounded-size
    top-k regardless of table size — the 100 TB answer for "roughly where
    are the deciles".
    """
    sample = kmv_sample(df, key, k=k).select("kmv_h", F.col(value_col).alias("v"))
    ranked = sample.select(
        "v",
        "kmv_h",
        F.row_number().over(Window.orderBy("v", "kmv_h")).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.max("kmv_h").over(Window.partitionBy()).alias("hk"),
    )
    qs = df.sparkSession.range(0, n_buckets + 1).select(F.col("id").cast("int").alias("q"))
    return (
        qs.crossJoin(F.broadcast(ranked))
        .filter(
            F.col("r")
            == F.expr(f"(2 * q * (n - 1) + {n_buckets}) div (2 * {n_buckets}) + 1")
        )
        .select(
            "q",
            F.col("v").alias("boundary"),
            # n < k: the sample is exhaustive (the table has fewer than k
            # keys), so the estimate is the EXACT distinct count n — the
            # (k-1)/(hk/2^60) formula would grossly overestimate there
            F.when(F.col("n") < k, F.col("n").cast("double"))
            .otherwise(
                F.round(
                    (F.lit(float(k - 1))) / (F.col("hk") / F.lit(float(1 << 60))), 3
                )
            )
            .alias("est_ndv"),
        )
    )


# ---------------------------------------------------------------------------
# One-permutation MinHash source signatures → cross-corpus overlap
# ---------------------------------------------------------------------------
def source_minhash_signature(
    df: DataFrame, group_col: str, key: Column, n_buckets: int = 64
) -> DataFrame:
    """One-permutation MinHash signature per group (Li et al. 2012): hash
    every key once, route it to bucket ``h % n_buckets``, keep the MIN hash
    per (group, bucket).  One GROUP BY with a MIN aggregate — fully
    map-side-combinable, constant state per group, the cleanest possible
    shape for a 100 TB scan.

    Returns (group, bucket, minh); groups with an empty bucket simply have
    no row for it (small corpora), which the estimator treats as
    uninformative.
    """
    h = portable_hash(key.cast("string"))
    return (
        df.select(F.col(group_col).alias("grp"), h.alias("h"))
        .withColumn("bucket", (F.col("h") % n_buckets).cast("int"))
        .groupBy("grp", "bucket")
        .agg(F.min("h").alias("minh"))
    )


def source_overlap_estimate(signatures: DataFrame, n_buckets: int = 64) -> DataFrame:
    """Pairwise content-overlap (Jaccard) estimates BETWEEN groups from
    their one-permutation MinHash signatures alone: the estimate is the
    fraction of buckets (populated on both sides) whose minima agree.

    This answers "how much does source A overlap source B" for cross-corpus
    dedup planning without ever joining the corpora — the comparison is
    n_groups² × n_buckets integers, independent of corpus size.

    Returns (grp_a, grp_b, n_common_buckets, n_match, est_jaccard),
    grp_a < grp_b.
    """
    a = signatures.select(
        F.col("grp").alias("grp_a"), "bucket", F.col("minh").alias("ma")
    )
    b = signatures.select(
        F.col("grp").alias("grp_b"), "bucket", F.col("minh").alias("mb")
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(
            F.count(F.lit(1)).alias("n_common_buckets"),
            F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)).alias("n_match"),
        )
        .select(
            "grp_a",
            "grp_b",
            "n_common_buckets",
            "n_match",
            F.round(F.col("n_match") / F.col("n_common_buckets"), 6).alias("est_jaccard"),
        )
        .orderBy("grp_a", "grp_b")
    )
