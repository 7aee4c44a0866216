"""Sampling / split / packing queries — deterministic pipeline plumbing
with oracles generated from the SAME integer thresholds the operators use
(`operators/sampling.py`)."""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import sampling as SA
from trough_spark.operators import text as X
from trough_spark.queries import query
from trough_spark.tables import load_table as T

_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
_STRATA_FRACTIONS = {"en": 0.25, "zh": 0.5, "es": 0.5, "de": 0.5, "fr": 0.5}


def _sql_hash(key_expr: str, salt: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'), 1, 15)) "
        f"AS BIGINT)"
    )


def _split_case() -> str:
    h = _sql_hash("doc_id", "split")
    clauses = "".join(
        f"WHEN {h} < {bound} THEN '{name}' "
        for name, bound in SA.split_bounds(_SPLIT_WEIGHTS)
    )
    last = list(_SPLIT_WEIGHTS)[-1]
    return f"CASE {clauses}ELSE '{last}' END"


@query(
    "sample_hash_split",
    oracle=f"""
    SELECT doc_id, {_split_case()} AS split
    FROM documents
    """,
)
def sample_hash_split(spark, sf_dir):
    """Reproducible train/val/test assignment (80/10/10) keyed on doc_id —
    a pure map; the same doc lands in the same split on any cluster layout,
    unlike seeded df.sample()."""
    docs = T(spark, sf_dir, "documents").select("doc_id")
    return SA.hash_split(docs, "doc_id", _SPLIT_WEIGHTS)


def _strata_case() -> str:
    clauses = "".join(
        f"WHEN lang = '{v}' THEN {SA.hash_threshold(f)} "
        for v, f in sorted(_STRATA_FRACTIONS.items())
    )
    return f"CASE {clauses}ELSE 0 END"


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_sql_hash("doc_id", "strata")} < {_strata_case()}
    """,
)
def sample_stratified(spark, sf_dir):
    """Language-rebalancing sample: downsample dominant 'en' to 25%, keep
    50% of the tail languages — per-stratum deterministic thresholds, still
    a shuffle-free map-side filter."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    return SA.stratified_sample(
        docs, "doc_id", "lang", _STRATA_FRACTIONS, default_fraction=0.0
    )


@query(
    "pack_sequences",
    oracle=r"""
    WITH toks AS (
      SELECT lang, doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             END AS n_tokens
      FROM documents
    ),
    cum AS (
      SELECT lang, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
      FROM toks
    )
    SELECT lang, doc_id, n_tokens,
           CAST(prev // 512 AS BIGINT) AS bin_id,
           CAST(prev - (prev // 512) * 512 AS BIGINT) AS bin_offset
    FROM cum
    """,
)
def pack_sequences(spark, sf_dir):
    """Sequence packing into 512-token bins, parallel per language: one
    window shuffle on the partition key, integer-only running sums.  At
    100 TB the partition key (shard/lang/source) bounds every window state
    and the packing scales with executor count."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "doc_id",
        X.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    return SA.pack_sequences(
        toks, "doc_id", "n_tokens", budget=512, partition_by="lang"
    )


@query(
    "pack_sequences_sharded",
    oracle=rf"""
    WITH toks AS (
      SELECT lang, doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
             END AS n_tokens,
             CAST({_sql_hash("doc_id", "pack")} % 4 AS INT) AS sub_shard
      FROM documents
    ),
    localb AS (
      SELECT lang, doc_id, n_tokens, sub_shard,
             CAST(prev // 512 AS BIGINT) AS local_bin,
             CAST(prev - (prev // 512) * 512 AS BIGINT) AS bin_offset
      FROM (
        SELECT lang, doc_id, n_tokens, sub_shard,
               COALESCE(SUM(n_tokens) OVER (PARTITION BY lang, sub_shard
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS prev
        FROM toks
      )
    ),
    bases AS (
      SELECT lang, sub_shard,
             COALESCE(SUM(bins_used) OVER (PARTITION BY lang ORDER BY sub_shard
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bin_base
      FROM (SELECT lang, sub_shard, MAX(local_bin) + 1 AS bins_used
            FROM localb GROUP BY 1, 2)
    )
    SELECT l.lang, l.doc_id, l.n_tokens, l.sub_shard,
           CAST(b.bin_base + l.local_bin AS BIGINT) AS bin_id, l.bin_offset
    FROM localb l
    JOIN bases b ON l.lang = b.lang AND l.sub_shard = b.sub_shard
    """,
)
def pack_sequences_sharded(spark, sf_dir):
    """Skew-proof hierarchical packing: a real corpus is mostly one
    language, so pack_sequences' per-language window makes that language a
    single reducer at 100 TB.  Here each (lang, hash-sub-shard) packs
    independently (fresh bin per sub-shard: <=1 partial bin wasted each)
    and global bin ids stay dense via a prefix-sum over the tiny
    per-sub-shard bin counts (operators/sampling.pack_sequences_sharded)."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        "doc_id",
        X.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
    )
    return SA.pack_sequences_sharded(
        toks, "doc_id", "n_tokens", budget=512, n_shards=4, partition_by="lang"
    )


# DoReMi-ish target mix: concentrate on 5 "high-quality" sources, keep a
# long tail.  Weights sum to 1; literals interpolated via repr()+e0 so both
# engines parse bit-identical doubles.
_MIX_WEIGHTS = {
    **{f"src{i}": 0.1 for i in range(5)},
    **{f"src{i}": 0.06 for i in range(5, 10)},
    **{f"src{i}": 0.02 for i in range(10, 20)},
}


def _mix_oracle() -> str:
    values = ", ".join(
        f"('{s}', {float(v)!r}e0)" for s, v in sorted(_MIX_WEIGHTS.items())
    )
    h = _sql_hash("d.doc_id", "mix")
    return f"""
    WITH w(source, w) AS (VALUES {values}),
    counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_avail FROM documents GROUP BY 1
    ),
    cw AS (SELECT c.source, c.n_avail, w.w FROM counts c JOIN w USING (source)),
    budget AS (SELECT MIN(n_avail / w) AS budget FROM cw),
    rates AS (
      SELECT source, n_avail,
             LEAST(CAST(1000000 AS BIGINT),
                   CAST(ROUND(budget * w / n_avail * 1e6) AS BIGINT)) AS rate_ppm
      FROM cw CROSS JOIN budget
    ),
    kept AS (
      SELECT d.source FROM documents d JOIN rates r USING (source)
      WHERE {h} % 1000000 < r.rate_ppm
    )
    SELECT r.source, r.n_avail, r.rate_ppm,
           CAST(COALESCE(k.n, 0) AS BIGINT) AS n_kept
    FROM rates r
    LEFT JOIN (SELECT source, COUNT(*) AS n FROM kept GROUP BY 1) k USING (source)
    """


@query("sample_mix_rebalance", oracle=_mix_oracle())
def sample_mix_rebalance(spark, sf_dir):
    """Static corpus mixing: acceptance rates derived in-plan from target
    weights + observed per-source counts (budget = min_s n_s/w_s), applied
    as a deterministic hash filter; reports per-source plan vs achieved.
    See operators/sampling.mix_rebalance."""
    docs = T(spark, sf_dir, "documents")
    kept = SA.mix_rebalance(docs, "doc_id", "source", _MIX_WEIGHTS)
    achieved = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_avail"))
    w = spark.createDataFrame(
        [(s, float(v)) for s, v in sorted(_MIX_WEIGHTS.items())], "source string, w double"
    )
    cw = counts.join(F.broadcast(w), "source")
    budget = cw.agg(F.min(F.col("n_avail") / F.col("w")).alias("budget"))
    rates = cw.crossJoin(F.broadcast(budget)).select(
        "source",
        F.col("n_avail").cast("bigint").alias("n_avail"),
        F.least(
            F.lit(1000000).cast("bigint"),
            F.round(
                F.col("budget") * F.col("w") / F.col("n_avail") * F.lit(1000000.0)
            ).cast("bigint"),
        ).alias("rate_ppm"),
    )
    return rates.join(achieved, "source", "left").select(
        "source",
        "n_avail",
        "rate_ppm",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
    )


@query(
    "sample_train_order",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, {_sql_hash("doc_id", "epoch0")} AS hh FROM documents
    )
    SELECT doc_id,
           CAST(hh % 8 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY hh % 8
                                   ORDER BY hh, doc_id) - 1 AS BIGINT) AS pos
    FROM h
    """,
)
def sample_train_order(spark, sf_dir):
    """Deterministic epoch shuffle for training order: (shard, pos) per
    document from a salted hash — reproducible across engines and cluster
    layouts (unlike ORDER BY random()), exact mid-epoch resumption by
    skipping pos < checkpoint, new epoch = new salt.  One shuffle on the
    shard key, then n_shards independent sorts
    (operators/sampling.train_order)."""
    docs = T(spark, sf_dir, "documents").select("doc_id")
    return SA.train_order(docs, "doc_id", n_shards=8, salt="epoch0")


@query(
    "sample_bottom_k_per_group",
    oracle="""
    SELECT source, doc_id, rnk FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5('bk:' || doc_id), doc_id) AS rnk
      FROM documents
    ) WHERE rnk <= 10
    """,
)
def sample_bottom_k_per_group(spark, sf_dir):
    """Bounded per-group sample: the 10 'bottom-k by salted hash' docs per
    source.  Hash-order bottom-k IS distributed reservoir sampling done
    right — deterministic (rerunnable on retries, unlike rand()), uniform,
    and mergeable: at 100 TB each partition keeps its local bottom-k and
    the combine keeps the global bottom-k, so the shuffle carries k rows
    per group per partition, never the group.  One window shuffle here;
    swap row_number for a partial TakeOrdered per group when k*groups is
    huge."""
    from pyspark.sql import Window as W

    d = T(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("bk:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 10)
    )


@query(
    "sample_temperature_lang",
    oracle=f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_avail FROM documents GROUP BY 1
    ),
    nm AS (SELECT MIN(n_avail) AS n_min FROM counts),
    rates AS (
      SELECT lang, n_avail,
             LEAST(CAST(1000000 AS BIGINT),
                   CAST(ROUND(sqrt(CAST(n_min AS DOUBLE) / n_avail) * 1000000)
                        AS BIGINT)) AS rate_ppm
      FROM counts CROSS JOIN nm
    ),
    kept AS (
      SELECT d.lang FROM documents d JOIN rates r USING (lang)
      WHERE {_sql_hash("d.doc_id", "temp")} % 1000000 < r.rate_ppm
    )
    SELECT r.lang, r.n_avail, r.rate_ppm,
           CAST(COALESCE(k.n, 0) AS BIGINT) AS n_kept
    FROM rates r
    LEFT JOIN (SELECT lang, COUNT(*) AS n FROM kept GROUP BY 1) k USING (lang)
    """,
)
def sample_temperature_lang(spark, sf_dir):
    """Temperature-scaled language sampling (alpha=0.5): keep each language
    at rate sqrt(n_min/n_lang), so kept counts track n_lang^0.5 — the
    multilingual-corpus standard for flattening the 'en' head without
    starving tail languages.  sqrt is IEEE-correctly-rounded, so the
    ppm rates are bit-identical across engines; the keep decision is the
    deterministic hash filter (operators/sampling.temperature_sample).
    Reports per-language plan (rate_ppm) vs achieved (n_kept)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    kept = SA.temperature_sample(docs, "doc_id", "lang", alpha=0.5)
    achieved = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_avail")
    )
    n_min = counts.agg(F.min("n_avail").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_avail",
        F.least(
            F.lit(1000000).cast("bigint"),
            F.round(
                F.sqrt(F.col("n_min").cast("double") / F.col("n_avail"))
                * F.lit(1000000.0)
            ).cast("bigint"),
        ).alias("rate_ppm"),
    )
    return rates.join(achieved, "lang", "left").select(
        "lang",
        "n_avail",
        "rate_ppm",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
    )


# DSIR oracle CTE chain, shared by the standalone-score query and the
# composed dsir->budget pipeline query below.
_DSIR_CTES = r"""
    WITH toks AS (
      SELECT doc_id AS id, CAST(lang = 'en' AS INT) AS is_t,
             string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    grams AS (
      SELECT id, is_t, unnest(toks) AS g FROM toks
      UNION ALL
      SELECT id, is_t, array_to_string(toks[i:i+1], ' ') AS g
      FROM toks, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
    ),
    feats AS (
      SELECT id, is_t,
             CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 1024 AS b
      FROM grams WHERE g <> ''
    ),
    tf AS (SELECT id, is_t, b, COUNT(*) AS tf FROM feats GROUP BY 1, 2, 3),
    stats AS (
      SELECT b, SUM(CASE WHEN is_t = 1 THEN tf ELSE 0 END) AS t_cnt,
             SUM(tf) AS r_cnt
      FROM tf GROUP BY 1
    ),
    tot AS (SELECT SUM(t_cnt) AS tot_t, SUM(r_cnt) AS tot_r FROM stats),
    q AS (
      SELECT b,
             CAST(ROUND(log10(
               (CAST(t_cnt + 1 AS DOUBLE) / (tot_t + 1024))
               / (CAST(r_cnt + 1 AS DOUBLE) / (tot_r + 1024))
             ) * 1000000, 0) AS BIGINT) AS qlr
      FROM stats CROSS JOIN tot
    )
"""


@query(
    "sample_dsir_weights",
    oracle=_DSIR_CTES + r"""
    SELECT tf.id, CAST(SUM(tf.tf) AS BIGINT) AS n_feats,
           ROUND(CAST(SUM(tf.tf * q.qlr) AS DOUBLE) /
                 CAST(SUM(tf.tf) AS BIGINT) / 1000000.0, 4) + 0.0 AS dsir_score
    FROM tf JOIN q USING (b)
    GROUP BY tf.id
    """,
)
def sample_dsir_weights(spark, sf_dir):
    """DSIR importance weights against an in-corpus target (docs with
    lang='en'): hashed unigram+bigram buckets, add-one smoothed
    log10(p_target/p_raw) per bucket quantized to exact integer micros,
    tf-weighted mean per doc.  The data-sized shuffle carries (id, int
    bucket, count); bucket stats (1024 rows) broadcast back
    (operators/sampling.dsir_weights)."""
    docs = T(spark, sf_dir, "documents")
    return SA.dsir_weights(
        docs, "doc_id", "text", target=F.col("lang") == "en", n_buckets=1024
    )


@query(
    "sample_group_cap",
    oracle=f"""
    SELECT doc_id, source, grp_rank FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY {_sql_hash("doc_id", "cap")}, doc_id) AS INT) AS grp_rank
      FROM documents
    ) WHERE grp_rank <= 20
    """,
)
def sample_group_cap(spark, sf_dir):
    """Per-source frequency cap — web curation's "at most N docs per host":
    within each source keep the 20 rows with the smallest deterministic
    hash, an unbiased fixed-size per-group sample independent of scan
    order.  One window shuffle on the group key (operators/sampling
    .group_cap)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source")
    return SA.group_cap(docs, "doc_id", "source", cap=20)


_ES_HASH = _sql_hash("doc_id", "wsample")
_ES_MICRO = (
    f"CAST(ROUND(-ln((CAST({_ES_HASH} AS DOUBLE) + 0.5) / 1152921504606846976.0)"
    " / CAST(n_chars AS DOUBLE) * 1000000) AS BIGINT)"
)


@query(
    "sample_weighted_es",
    oracle=f"""
    SELECT doc_id, n_chars, arrival_micro FROM (
      SELECT doc_id, n_chars, {_ES_MICRO} AS arrival_micro
      FROM documents WHERE CAST(n_chars AS DOUBLE) > 0.0
    ) ORDER BY arrival_micro, doc_id LIMIT 64
    """,
)
def sample_weighted_es(spark, sf_dir):
    """Efraimidis-Spirakis weighted sample without replacement: the 64
    documents with the smallest deterministic exponential arrival time
    -ln(u)/n_chars — inclusion proportional to length, no duplicates,
    reproducible under any partitioning.  Spark runs it as
    TakeOrderedAndProject (per-partition top-k heaps, driver k-merge): no
    global sort, no data-sized shuffle (operators/sampling
    .weighted_sample)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return SA.weighted_sample(docs, "doc_id", "n_chars", k=64)


@query(
    "sample_weighted_per_lang",
    oracle=f"""
    SELECT doc_id, lang, arrival_micro FROM (
      SELECT doc_id, lang, arrival_micro,
             ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY arrival_micro, doc_id) AS rn
      FROM (
        SELECT doc_id, lang, {_ES_MICRO} AS arrival_micro
        FROM documents WHERE CAST(n_chars AS DOUBLE) > 0.0
      )
    ) WHERE rn <= 8
    """,
)
def sample_weighted_per_lang(spark, sf_dir):
    """Per-stratum Efraimidis-Spirakis: the 8 length-weighted picks WITHIN
    each language — weighted mixture construction where every stratum must
    be represented.  One hash-partition exchange on lang, per-group top-k
    window (operators/sampling.weighted_sample_per_group)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return SA.weighted_sample_per_group(
        docs, "doc_id", "n_chars", "lang", k=8
    ).drop("n_chars")


@query(
    "sample_budget_select",
    oracle="""
    SELECT doc_id, n_chars, cum_before FROM (
      SELECT doc_id, n_chars,
             CAST(COALESCE(SUM(n_chars) OVER (
               ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before
      FROM documents
    ) WHERE cum_before < 100000
    """,
)
def sample_budget_select(spark, sf_dir):
    """Budget-constrained greedy selection: longest documents first until
    a 100k-char budget is spent — the resampling stage of importance-
    weighted data curation.  NOT the single-reducer global window the SQL
    form implies: a distributed prefix-sum (range slices + per-slice
    offsets) keeps every sort bounded to corpus/n_ranges
    (operators/sampling.budget_select)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return SA.budget_select(
        docs, "doc_id", "n_chars", "n_chars", budget=100000.0
    )


@query(
    "sample_budget_per_lang",
    oracle="""
    SELECT doc_id, lang, n_chars, cum_before FROM (
      SELECT doc_id, lang, n_chars,
             CAST(COALESCE(SUM(n_chars) OVER (
               PARTITION BY lang
               ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before
      FROM documents
    ) WHERE cum_before < 20000
    """,
)
def sample_budget_per_lang(spark, sf_dir):
    """Per-stratum budget: 20k chars of the longest documents WITHIN each
    language — per-language token-budget mixture targets.  One hash
    exchange on lang (operators/sampling.budget_select_per_group)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return SA.budget_select_per_group(
        docs, "doc_id", "n_chars", "n_chars", "lang", budget=20000.0
    )


@query(
    "pipeline_dsir_budget",
    oracle=_DSIR_CTES + r""",
    scores AS (
      SELECT tf.id,
             ROUND(CAST(SUM(tf.tf * q.qlr) AS DOUBLE) /
                   CAST(SUM(tf.tf) AS BIGINT) / 1000000.0, 4) + 0.0
               AS dsir_score
      FROM tf JOIN q USING (b)
      GROUP BY tf.id
    ),
    sel AS (
      SELECT s.id, d.n_chars, s.dsir_score,
             CAST(COALESCE(SUM(d.n_chars) OVER (
               ORDER BY s.dsir_score DESC, s.id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before
      FROM scores s JOIN documents d ON d.doc_id = s.id
    )
    SELECT id, n_chars, dsir_score, cum_before
    FROM sel WHERE cum_before < 60000
    """,
)
def pipeline_dsir_budget(spark, sf_dir):
    """The round-7 selection pipeline end-to-end: DSIR target-likeness
    scores (hashed n-gram log-ratio vs the lang='en' subset) feed the
    budget-constrained greedy selector — keep the most target-like
    documents until a 60k-char budget is spent.  Composes dsir_weights
    (one (id,bucket) shuffle + broadcast bucket stats) with budget_select
    (distributed prefix-sum, no single-reducer sort); the oracle chains
    the same CTEs into one window."""
    docs = T(spark, sf_dir, "documents")
    scores = SA.dsir_weights(
        docs, "doc_id", "text", target=F.col("lang") == "en", n_buckets=1024
    ).select("id", "dsir_score")
    joined = scores.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    ).select("id", "n_chars", "dsir_score")
    return SA.budget_select(
        joined, "id", "n_chars", "dsir_score", budget=60000.0
    )


@query(
    "sample_interleave_lang",
    oracle=r"""
    WITH r AS (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rnd
      FROM documents
    )
    SELECT doc_id, lang, rnd,
           CAST(ROW_NUMBER() OVER (ORDER BY rnd, lang) - 1 AS BIGINT) AS pos
    FROM r
    """,
)
def sample_interleave_lang(spark, sf_dir):
    """Round-robin language interleave for balanced multilingual training
    order.  The oracle IS the naive single-reducer global sort
    (`ROW_NUMBER() OVER (ORDER BY rnd, lang)`); the Spark side computes the
    identical position arithmetically from a broadcast per-language
    histogram plus a distributed per-group enumeration — zero global
    sorts (see operators/sampling.py:interleave_order)."""
    d = T(spark, sf_dir, "documents").select("doc_id", "lang")
    return SA.interleave_order(d, "doc_id", "lang")


@query(
    "sample_repeat_upsample",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source,
             1.0 + (CAST(substr(source, 4) AS INT) % 4) * 0.5 AS w
      FROM documents
    ),
    coin AS (
      SELECT doc_id, source,
             CAST(FLOOR(w) AS BIGINT)
             + CASE WHEN {_sql_hash("doc_id", "repeat")}
                         < CAST((w - FLOOR(w)) * {SA.HASH_SPACE} AS BIGINT)
                    THEN 1 ELSE 0 END AS n_epochs
      FROM base
    )
    SELECT c.doc_id, c.source, c.n_epochs, t.epoch,
           CAST(('0x' || substr(md5(
             CAST(c.doc_id AS VARCHAR) || '#' || CAST(t.epoch AS VARCHAR)
             || ':repeat_order'), 1, 15)) AS BIGINT) AS order_key
    FROM coin c, UNNEST(generate_series(1, c.n_epochs)) AS t(epoch)
    WHERE c.n_epochs > 0
    """,
)
def sample_repeat_upsample(spark, sf_dir):
    """Repeat-epoch upsampling: per-source mixture weights in [1.0, 2.5]
    (derived deterministically from the source id) materialized into an
    actual training list — floor(w) guaranteed copies plus a portable
    hash coin for the fractional epoch, each instance stamped with a
    global shuffle key so the copies spread across the schedule.

    Scale: entirely map-side (`operators/sampling.py repeat_upsample`) —
    no shuffle, no window; output size = corpus x mean(weight)."""
    docs = T(spark, sf_dir, "documents")
    w = F.lit(1.0) + (F.substring("source", 4, 10).cast("int") % 4) * F.lit(0.5)
    out = SA.repeat_upsample(docs.select("doc_id", "source"), "doc_id", w)
    return out.select("doc_id", "source", "n_epochs", "epoch", "order_key")


@query(
    "sample_length_batches",
    oracle=f"""
    WITH b AS (
      SELECT CAST(doc_id AS VARCHAR) AS id,
             CAST(n_chars AS BIGINT) AS n,
             CAST(length(bin(CAST(n_chars AS BIGINT))) - 1 AS INT) AS bucket,
             lpad(CAST({_sql_hash("doc_id", "lenbucket")} AS VARCHAR), 19, '0')
               || ':' || CAST(doc_id AS VARCHAR) AS ck
      FROM documents WHERE n_chars >= 1
    ),
    r AS (
      SELECT bucket, n,
             row_number() OVER (PARTITION BY bucket ORDER BY ck) AS rnd
      FROM b
    ),
    g AS (
      SELECT bucket, CAST((rnd - 1) // 16 AS BIGINT) AS batch_id, n FROM r
    )
    SELECT bucket, batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(n) AS max_len,
           CAST(SUM(n) AS BIGINT) AS sum_len,
           CAST(MAX(n) * CAST(COUNT(*) AS BIGINT) - SUM(n) AS BIGINT) AS waste
    FROM g GROUP BY 1, 2
    """,
)
def sample_length_batches(spark, sf_dir):
    """Length-bucketed smart batching over the documents table: power-of-
    two length bands, hash-ordered in-bucket batches of 16, per-batch
    padding waste.  The oracle's window is the semantic spec; the engine
    computes the same ranks with `interleave_order`'s distributed
    range-slice enumeration — no one-task-per-bucket sort."""
    docs = T(spark, sf_dir, "documents")
    return SA.length_bucket_batches(docs, "doc_id", "n_chars", batch_size=16)
