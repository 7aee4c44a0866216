"""Text-analysis queries over the `documents` table, with DuckDB oracles.

Note every oracle regexp_replace carries the 'g' flag — DuckDB replaces only
the first match by default, Spark replaces all.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import text as X
from trough_spark.queries import query
from trough_spark.tables import load_table as T

_EN = "['the', 'and', 'of', 'to', 'a']"
# BPE pattern for DuckDB SQL literal (single quotes doubled)
X_BPE_SQL = "''(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"


@query(
    "text_token_count",
    oracle=r"""
    SELECT doc_id AS id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT) END AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    import pyspark.sql.functions as F

    return d.select(F.col("doc_id").alias("id"), X.token_count(F.col("text")).alias("n_tokens"))


@query(
    "text_quality_features",
    oracle=rf"""
    WITH feats AS (
      SELECT doc_id AS id,
             CAST(length(text) AS INT) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT) END AS n_tokens,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
             CAST(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g')) AS INT)
               AS n_punct,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                  t -> list_contains({_EN}, t))) AS INT) AS n_stopwords,
             length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
      FROM documents
    )
    SELECT id, n_chars, n_tokens, n_alpha, n_punct, n_stopwords,
           ROUND(CASE WHEN n_tokens > 0 THEN n_nonspace / n_tokens END, 6) AS avg_token_len,
           CASE WHEN n_tokens < 5 THEN 'too_short'
                WHEN n_alpha / greatest(n_chars, 1) < 0.6 THEN 'low_alpha'
                WHEN n_stopwords = 0 THEN 'no_stopwords'
                ELSE 'ok' END AS quality_bucket
    FROM feats
    """,
)
def text_quality_features(spark, sf_dir):
    return X.quality_features(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_lang_id",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS id, lang, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    scored AS (
      SELECT id, lang,
        lpad(CAST(len(list_filter(t, x -> list_contains(['der','die','und','das','ist'], x))) AS VARCHAR), 6, '0') || 'de' AS s_de,
        lpad(CAST(len(list_filter(t, x -> list_contains(['the','and','of','to','a'], x))) AS VARCHAR), 6, '0') || 'en' AS s_en,
        lpad(CAST(len(list_filter(t, x -> list_contains(['el','la','los','que','de'], x))) AS VARCHAR), 6, '0') || 'es' AS s_es,
        lpad(CAST(len(list_filter(t, x -> list_contains(['le','la','et','les','des'], x))) AS VARCHAR), 6, '0') || 'fr' AS s_fr,
        lpad(CAST(len(list_filter(t, x -> list_contains(['的','是','了','在','我'], x))) AS VARCHAR), 6, '0') || 'zh' AS s_zh
      FROM toks
    )
    SELECT id,
           substr(greatest(s_de, s_en, s_es, s_fr, s_zh), 7) AS predicted_lang,
           CAST(substr(greatest(s_de, s_en, s_es, s_fr, s_zh), 1, 6) AS BIGINT) AS marker_score
    FROM scored
    """,
)
def text_lang_id(spark, sf_dir):
    return X.lang_id(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_fingerprint",
    oracle=r"""
    SELECT doc_id AS id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                   '\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    return X.fingerprint(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id AS id, t.term
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
           UNNEST(toks) AS t(term)
      WHERE length(t.term) > 0
    ),
    tc AS (SELECT id, term, COUNT(*) AS tcnt FROM tok GROUP BY 1, 2),
    dl AS (SELECT id, COUNT(*) AS dlen FROM tok GROUP BY 1),
    df AS (SELECT term, COUNT(*) AS dfreq FROM tc GROUP BY 1),
    n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents),
    scored AS (
      SELECT tc.id, tc.term, tc.tcnt AS term_count,
             ROUND((tcnt / dlen) * ln(CAST(nd AS DOUBLE) / dfreq), 6) AS tfidf
      FROM tc JOIN dl USING (id) JOIN df USING (term) CROSS JOIN n
    )
    SELECT id, term, term_count, tfidf, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 5 AND id < 200
    """,
)
def text_tfidf_top_terms(spark, sf_dir):
    from pyspark.sql import Window as W

    scored = X.tf_idf(T(spark, sf_dir, "documents"), "doc_id", "text")
    w = W.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 5) & (F.col("id") < 200))
    )


@query(
    "text_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT t.term
      FROM (SELECT string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
           UNNEST(toks) AS t(term)
      WHERE length(t.term) > 0
    )
    SELECT term, COUNT(*) AS n FROM tok
    GROUP BY term ORDER BY n DESC, term LIMIT 20
    """,
)
def text_top_terms(spark, sf_dir):
    # Corpus heavy hitters: explode + partial-agg count + TakeOrdered top-k.
    # At 100 TB the same shape holds (shuffle carries term partial counts);
    # sketch variants (count-min) slot in when exactness isn't required.
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term")
    ).filter(F.length("term") > 0)
    return (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


@query(
    "text_bpe_token_count",
    oracle=rf"""
    SELECT doc_id AS id,
           CAST(len(regexp_extract_all(text, '{X_BPE_SQL}')) AS INT) AS n_bpe_tokens,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT) END AS n_ws_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark, sf_dir):
    # whitespace count vs BPE-ish pretokenizer count side by side — the two
    # token accountings a data pipeline reports
    d = T(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("id"),
        X.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        X.token_count(F.col("text")).alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# Corpus-statistics quality: boilerplate share, contamination, unigram LM
# ---------------------------------------------------------------------------
_SH_CTE = r"""
    toks AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT id, sh FROM (
        SELECT id, array_to_string(toks[i:i+2], ' ') AS sh
        FROM toks, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)
      )
    )
"""


@query(
    "text_boilerplate_ratio",
    oracle=f"""
    WITH {_SH_CTE},
    freq AS (SELECT sh, COUNT(*) AS df_cnt FROM sh GROUP BY sh),
    flag AS (SELECT sh, (df_cnt >= 5) AS is_boiler FROM freq)
    SELECT s.id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN fl.is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
           ROUND(CAST(SUM(CASE WHEN fl.is_boiler THEN 1 ELSE 0 END) AS BIGINT) /
                 CAST(COUNT(*) AS DOUBLE), 4) AS boilerplate_ratio
    FROM sh s JOIN flag fl ON fl.sh = s.sh
    GROUP BY s.id
    """,
)
def text_boilerplate_ratio(spark, sf_dir):
    """Share of each doc's 3-gram shingles recurring in >=5 documents
    (CCNet-style repeated-content signal at n-gram granularity — this
    corpus has no newlines, so 'lines' are n-grams).  Integer compares
    decide boilerplate; one rounded double at the end."""
    return X.boilerplate_ratio(
        T(spark, sf_dir, "documents"), "doc_id", "text", n=3, min_docs=5
    )


@query(
    "text_contamination",
    oracle=f"""
    WITH {_SH_CTE},
    bench AS (SELECT DISTINCT sh FROM sh WHERE id < 25),
    corp AS (SELECT id, sh FROM sh WHERE id >= 25),
    hits AS (
      SELECT c.id, COUNT(*) AS n_overlap
      FROM corp c JOIN bench b ON b.sh = c.sh GROUP BY c.id
    ),
    per AS (SELECT id, COUNT(*) AS n_shingles FROM corp GROUP BY id)
    SELECT p.id, p.n_shingles,
           COALESCE(h.n_overlap, 0) AS n_overlap,
           ROUND(COALESCE(h.n_overlap, 0) / CAST(p.n_shingles AS DOUBLE), 4)
             AS contamination
    FROM per p LEFT JOIN hits h ON h.id = p.id
    """,
)
def text_contamination(spark, sf_dir):
    """Benchmark-leak check: docs 0-24 stand in as the benchmark set; every
    other doc is scored by the fraction of its distinct 3-gram shingles
    found anywhere in the benchmark.  The benchmark shingle set is small →
    broadcast semi join on the shingle key."""
    docs = T(spark, sf_dir, "documents")
    return X.contamination(
        docs.filter(F.col("doc_id") >= 25),
        docs.filter(F.col("doc_id") < 25),
        "doc_id",
        "text",
        n=3,
    )


@query(
    "text_unigram_logprob",
    oracle=r"""
    WITH tk AS (
      SELECT id, tok FROM (
        SELECT doc_id AS id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    tf AS (SELECT id, tok, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
    cnt AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM tk),
    q AS (
      SELECT tok,
             CAST(ROUND(log10(CAST(cnt AS DOUBLE) / total) * 1000000, 0) AS BIGINT)
               AS qlog
      FROM cnt CROSS JOIN tot
    )
    SELECT tf.id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(tf.tf * q.qlog) AS DOUBLE) /
                 CAST(SUM(tf.tf) AS BIGINT) / 1000000.0, 4) AS mean_logprob
    FROM tf JOIN q ON q.tok = tf.tok
    GROUP BY tf.id
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Mean unigram log10-probability per doc under the corpus's own
    unigram LM — the classic cheap quality score.  Token log-probs quantize
    to exact BIGINTs (engine-verified), so aggregation is order-proof."""
    return X.unigram_logprob(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_repetition_ratio",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    grams AS (
      SELECT id, array_to_string(toks[i:i+2], ' ') AS g
      FROM toks, UNNEST(generate_series(1, greatest(len(toks) - 2, 0))) AS t(i)
    )
    SELECT id, COUNT(*) AS n_grams, COUNT(DISTINCT g) AS n_distinct,
           ROUND((COUNT(*) - COUNT(DISTINCT g)) / CAST(COUNT(*) AS DOUBLE), 4)
             AS repetition_ratio
    FROM grams GROUP BY id
    """,
)
def text_repetition_ratio(spark, sf_dir):
    """Within-doc 3-gram repetition share (Gopher repetition filter) —
    complements cross-doc boilerplate: this catches looping/templated text
    inside one document."""
    return X.repetition_ratio(T(spark, sf_dir, "documents"), "doc_id", "text", n=3)


@query(
    "text_source_rollup",
    oracle=rf"""
    WITH feats AS (
      SELECT doc_id AS id, source,
             CAST(length(text) AS INT) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT) END AS n_tokens,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                  t -> list_contains({_EN}, t))) AS INT) AS n_stopwords
      FROM documents
    ),
    qual AS (
      SELECT id, source,
             CASE WHEN n_tokens < 5 THEN 'too_short'
                  WHEN n_alpha / greatest(n_chars, 1) < 0.6 THEN 'low_alpha'
                  WHEN n_stopwords = 0 THEN 'no_stopwords'
                  ELSE 'ok' END AS quality_bucket
      FROM feats
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN quality_bucket = 'ok' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           ROUND(CAST(SUM(CASE WHEN quality_bucket = 'ok' THEN 1 ELSE 0 END) AS BIGINT)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS ok_pct,
           CASE WHEN CAST(SUM(CASE WHEN quality_bucket = 'ok' THEN 1 ELSE 0 END) AS BIGINT) * 100
                     >= 85 * COUNT(*)
                THEN 'keep' ELSE 'block' END AS verdict
    FROM qual GROUP BY source
    """,
)
def text_source_rollup(spark, sf_dir):
    """Source/domain-level quality verdict: per-source share of 'ok' docs
    with an 85% keep threshold — the way document-level signals become a
    domain blocklist.  One partial-aggregated groupBy on the source key."""
    return X.source_quality_rollup(
        T(spark, sf_dir, "documents"), "doc_id", "text", "source", min_ok_pct=85
    )


_PII_SUFFIX_SQL = (
    "' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 555-' "
    "|| lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') "
    "|| ' at 10.' || CAST(doc_id % 200 AS VARCHAR) "
    "|| '.' || CAST(doc_id % 250 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)"
)


def _pii_suffix_spark():
    d = F.col("doc_id")
    return F.concat(
        F.lit(" contact user"), d.cast("string"), F.lit("@example.com or 555-"),
        F.lpad((d % 1000).cast("string"), 3, "0"), F.lit("-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" at 10."), (d % 200).cast("string"),
        F.lit("."), (d % 250).cast("string"), F.lit("."), (d % 100).cast("string"),
    )


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH pii AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || {_PII_SUFFIX_SQL} ELSE text END AS t
      FROM documents
    )
    SELECT doc_id AS id,
           CAST(len(regexp_extract_all(t, '{X.PII_PATTERNS["email"]}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t, '{X.PII_PATTERNS["phone"]}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(t, '{X.PII_PATTERNS["ip"]}')) AS BIGINT) AS n_ip,
           CAST(length(
             regexp_replace(regexp_replace(regexp_replace(t,
               '{X.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
               '{X.PII_PATTERNS["phone"]}', '<PHONE>', 'g'),
               '{X.PII_PATTERNS["ip"]}', '<IP>', 'g')) AS BIGINT) AS clean_len
    FROM pii
    """,
)
def text_pii_scrub(spark, sf_dir):
    """PII redaction audit: a third of the docs get deterministic synthetic
    PII (email + phone + IPv4 derived from doc_id) woven in, then the
    scrubber counts and redacts every span.  Pure map end-to-end — at
    100 TB this is a scan-stage transform with zero shuffle; the synthetic
    injection stands in for real PII the test corpus lacks."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), _pii_suffix_spark())
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    out = X.pii_scrub(docs, "doc_id", "t")
    return out.select(
        "id",
        F.col("n_email").cast("bigint").alias("n_email"),
        F.col("n_phone").cast("bigint").alias("n_phone"),
        F.col("n_ip").cast("bigint").alias("n_ip"),
        F.length("clean_text").cast("bigint").alias("clean_len"),
    )


@query(
    "text_chunk_windows",
    oracle="""
    WITH sized AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk,
             len(string_split_regex(trim(text), '\\s+')) AS n
      FROM documents
    ),
    counted AS (
      SELECT doc_id, tk, n,
             CASE WHEN n <= 32 THEN 1 ELSE CAST((n - 32 + 23) // 24 AS INT) + 1 END AS nc
      FROM sized
    ),
    expanded AS (
      SELECT doc_id, tk, n,
             unnest(generate_series(0, CAST(nc - 1 AS BIGINT))) AS i
      FROM counted
    )
    SELECT doc_id AS id, CAST(i AS INT) AS chunk_idx,
           CAST(LEAST(32, n - i * 24) AS BIGINT) AS n_tokens,
           array_to_string(tk[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
    FROM expanded
    """,
)
def text_chunk_windows(spark, sf_dir):
    """Token-window chunking (window=32, stride=24 → 8-token overlap), the
    long-document prep for a fixed-context trainer.  One posexplode per
    doc, no shuffle; chunk fan-out is exact integer arithmetic so the
    oracle reproduces every boundary."""
    return X.chunk_tokens(
        T(spark, sf_dir, "documents"), "doc_id", "text", window=32, stride=24
    )


_BM25_TERMS = ["spark", "hash", "window", "merge"]
_BM25_K1 = 1.2
_BM25_B = 0.75
# SQL literals interpolated via repr() of the exact Python doubles Spark uses
# (F.lit(k1 + 1.0) etc.) so both engines parse bit-identical constants; the
# e0 suffix forces DuckDB to read them as DOUBLE, not DECIMAL.
_BM25_BODY = f"""
    base AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ),
    lens AS (SELECT id, CAST(len(toks) AS INT) AS dl FROM base),
    tf AS (
      SELECT id, t.term, COUNT(*) AS tf
      FROM base, UNNEST(toks) AS t(term)
      WHERE t.term IN ({", ".join("'" + t + "'" for t in _BM25_TERMS)})
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, COUNT(*) AS df_ FROM tf GROUP BY 1),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
      FROM lens
    ),
    contrib AS (
      SELECT tf.id,
             CAST(ROUND(
               ln((n_docs - df_ + 5e-1) / (df_ + 5e-1) + 1e0)
               * ((tf * {_BM25_K1 + 1.0!r}e0) /
                  (tf + {_BM25_K1!r}e0 *
                   ({1.0 - _BM25_B!r}e0 + {_BM25_B!r}e0 * dl
                    / (CAST(sum_dl AS DOUBLE) / n_docs))))
               * 1e6) AS BIGINT) AS c
      FROM tf
      JOIN dfreq USING (term)
      JOIN lens ON lens.id = tf.id
      CROSS JOIN stats
    ),
    bm25_scores AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
             CAST(SUM(c) AS BIGINT) AS score_micro
      FROM contrib GROUP BY id
    )
"""

_BM25_SQL = f"""
    WITH {_BM25_BODY}
    SELECT id, n_terms_hit, score_micro FROM bm25_scores
    ORDER BY score_micro DESC, id LIMIT 20
"""


@query("text_bm25_search", oracle=_BM25_SQL)
def text_bm25_search(spark, sf_dir):
    """BM25 keyword retrieval over documents (top-20 for a 4-term query).
    Per-term score contributions are quantized to integer micro-units before
    the per-doc sum, so ranking is an integer order in both engines; ties at
    the cutoff break by doc id (see operators/text.bm25_topk)."""
    return X.bm25_topk(
        T(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        _BM25_TERMS,
        k1=_BM25_K1,
        b=_BM25_B,
        k=20,
    )


@query(
    "text_surt_canonicalize",
    oracle=r"""
    WITH urls AS (
      SELECT doc_id,
             'https://WWW.' || source || '.Example.COM/docs/' || doc_id
               || '?utm_source=feed&ref=' || lang || '&id=' || doc_id AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
             regexp_replace(
               lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
               '^www\.', '') AS host,
             CASE WHEN regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) = ''
                  THEN '/'
                  ELSE regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1)
             END AS path,
             array_to_string(list_sort(list_filter(
               string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
               p -> NOT (p LIKE 'utm\_%' ESCAPE '\' OR p LIKE 'fbclid=%'
                         OR p LIKE 'gclid=%' OR p = ''))), '&') AS qs
      FROM urls
    )
    SELECT doc_id, url, host,
           array_to_string(list_reverse(string_split(host, '.')), ',')
             || ')' || path || CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS surt
    FROM parts
    """,
)
def text_surt_canonicalize(spark, sf_dir):
    """SURT canonicalization over synthesized per-doc URLs (the documents
    table carries no real URLs; the synthesis exercises every rule: mixed
    case, www prefix, tracking params, param reordering)."""
    docs = T(spark, sf_dir, "documents")
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://WWW."),
            F.col("source"),
            F.lit(".Example.COM/docs/"),
            F.col("doc_id"),
            F.lit("?utm_source=feed&ref="),
            F.col("lang"),
            F.lit("&id="),
            F.col("doc_id"),
        ).alias("url"),
    )
    return X.surt_canonicalize(with_url, "url").select("doc_id", "url", "host", "surt")


@query(
    "text_outlier_mad",
    oracle="""
    WITH d AS (SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents),
    med AS (SELECT source, median(x) AS med FROM d GROUP BY source),
    j AS (SELECT d.source, x, med FROM d JOIN med USING (source)),
    mad AS (SELECT source, median(abs(x - med)) AS mad FROM j GROUP BY source)
    SELECT j.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN abs(x - med) > 4.4478 * mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           ROUND(MIN(med), 6) AS med,
           ROUND(MIN(mad), 6) AS mad
    FROM j JOIN mad USING (source)
    GROUP BY j.source
    """,
)
def text_outlier_mad(spark, sf_dir):
    """Robust per-source outlier counts on document length: median absolute
    deviation with the 1.4826 normal-consistency factor (|x - med| >
    3*1.4826*mad flags a doc).  Robust stats are the right data-quality
    screen at corpus scale — a handful of 100 MB pathological docs shifts a
    mean+stddev fence, never a median+MAD fence.

    Scale: exact medians need two passes (med, then MAD) — each one shuffle
    keyed by source; the per-source median tables are tiny and broadcast
    back.  At 100 TB swap F.median for approx_percentile(x, 0.5, eps) and
    the same plan becomes single-digit-error one-pass-per-stat."""
    d = T(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("double").alias("x")
    )
    med = d.groupBy("source").agg(F.median("x").alias("med"))
    j = d.join(F.broadcast(med), "source")
    mad = j.groupBy("source").agg(F.median(F.abs(F.col("x") - F.col("med"))).alias("mad"))
    return (
        j.join(F.broadcast(mad), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.abs(F.col("x") - F.col("med")) > 4.4478 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_outliers"),
            F.round(F.min("med"), 6).alias("med"),
            F.round(F.min("mad"), 6).alias("mad"),
        )
    )


@query(
    "text_quality_ntile",
    oracle="""
    SELECT doc_id, source,
           NTILE(10) OVER (PARTITION BY source
                           ORDER BY n_chars, doc_id) AS len_decile
    FROM documents
    """,
)
def text_quality_ntile(spark, sf_dir):
    """Per-source quantile normalization: decile-rank document length within
    its source.  Raw quality scores aren't comparable across sources (a
    'long' webpage and a 'long' paper differ 100x); rank-normalizing within
    source is the standard fix before mixing corpora.  One window shuffle on
    source; deterministic via the doc_id tiebreak."""
    from pyspark.sql import Window as W

    d = T(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    return d.select("doc_id", "source", F.ntile(10).over(w).alias("len_decile"))


@query(
    "text_html_strip",
    oracle=r"""
    WITH src AS (
      SELECT doc_id,
             '<html><body><p class="d">' || text ||
             ' &amp; more</p><script>var x = 1;</script><!-- c --></body></html>'
               AS html
      FROM documents
    ),
    s1 AS (SELECT doc_id, regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM src),
    s2 AS (SELECT doc_id, regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM s1),
    s3 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM s2),
    s4 AS (SELECT doc_id, regexp_replace(t, '<[^>]+>', ' ', 'g') AS t FROM s3),
    s5 AS (SELECT doc_id, regexp_replace(t, '&lt;', '<', 'g') AS t FROM s4),
    s6 AS (SELECT doc_id, regexp_replace(t, '&gt;', '>', 'g') AS t FROM s5),
    s7 AS (SELECT doc_id, regexp_replace(t, '&quot;', '"', 'g') AS t FROM s6),
    s8 AS (SELECT doc_id, regexp_replace(t, '&#39;', '''', 'g') AS t FROM s7),
    s9 AS (SELECT doc_id, regexp_replace(t, '&nbsp;', ' ', 'g') AS t FROM s8),
    s10 AS (SELECT doc_id, regexp_replace(t, '&amp;', '&', 'g') AS t FROM s9),
    fin AS (SELECT doc_id, trim(regexp_replace(t, '[ ' || chr(9) || chr(13) || chr(10) || chr(12) || ']+', ' ', 'g')) AS stripped FROM s10)
    SELECT doc_id, CAST(length(stripped) AS INT) AS n_chars, md5(stripped) AS stripped_md5
    FROM fin
    """,
)
def text_html_strip(spark, sf_dir):
    """HTML-to-text boilerplate strip — the first transform of every
    web-crawl pipeline: drop script/style/comment blocks, then tags, decode
    the common entities, collapse whitespace.  Map-only native regexp chain
    (zero shuffle; asserted in test_plans) — at 100 TB this runs inside the
    scan stage at I/O speed.  Documents are wrapped in a deterministic HTML
    shell so the strip is exercised end to end; the md5 of the recovered
    text is the hash-gate evidence both engines stripped identically."""
    docs = T(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body><p class="d">'),
        F.col("text"),
        F.lit(' &amp; more</p><script>var x = 1;</script><!-- c --></body></html>'),
    )
    stripped = X.html_strip(html)
    return docs.select(
        "doc_id",
        F.length(stripped).cast("int").alias("n_chars"),
        F.md5(stripped).alias("stripped_md5"),
    )


@query(
    "text_classifier_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         t -> t != '') AS tk
      FROM documents
    ),
    scored AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(tk, t ->
               (CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) % 262144)
               * 2654435761 % 2000001 - 1000000)) AS BIGINT) AS s
      FROM toks
    )
    SELECT doc_id AS id, n_tokens,
           CASE WHEN n_tokens > 0
                THEN CAST(ROUND(s / n_tokens / 1000000 * 1000000, 0) AS BIGINT)
                ELSE 0 END AS margin_micro,
           CASE WHEN n_tokens > 0 AND
                     CAST(ROUND(s / n_tokens / 1000000 * 1000000, 0) AS BIGINT) > 0
                THEN 'keep' ELSE 'drop' END AS label
    FROM scored
    """,
)
def text_classifier_score(spark, sf_dir):
    """In-plan linear classifier inference — the fastText/quality-scorer
    shape every corpus filter runs: tokens hash to feature buckets, bucket
    weights sum, the mean decides keep/drop.  A PURE MAP (higher-order
    array fold, no explode, no shuffle, no Python); real deployments swap
    the implicit Knuth-mix weight table for broadcast trained weights with
    the identical plan.  See operators/text.hashed_classifier."""
    docs = T(spark, sf_dir, "documents")
    return X.hashed_classifier(docs, "doc_id", "text")


@query(
    "text_hashed_embedding",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    h AS (
      SELECT id,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hv
      FROM tok WHERE tok != ''
    )
    SELECT id,
           CAST(hv % 64 AS INT) AS dim,
           CAST(SUM(CASE WHEN (hv // 4294967296) % 2 = 1 THEN 1 ELSE -1 END)
                AS BIGINT) AS weight
    FROM h
    GROUP BY 1, 2
    HAVING SUM(CASE WHEN (hv // 4294967296) % 2 = 1 THEN 1 ELSE -1 END) != 0
    """,
)
def text_hashed_embedding(spark, sf_dir):
    """Feature-hashing document embeddings (sparse long form) — the
    vocabulary-free text->vector bridge feeding the cosine/ANN stack."""
    docs = T(spark, sf_dir, "documents")
    return X.hashed_embedding(docs, "doc_id", "text", dims=64)


_ANN_BODY = r"""
    tok AS (
      SELECT doc_id AS id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    h AS (
      SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS hv
      FROM tok WHERE tok != ''
    ),
    emb AS (
      SELECT id, CAST(hv % 64 AS INT) AS dim,
             CAST(SUM(CASE WHEN (hv // 4294967296) % 2 = 1 THEN 1 ELSE -1 END)
                  AS BIGINT) AS w
      FROM h GROUP BY 1, 2
      HAVING SUM(CASE WHEN (hv // 4294967296) % 2 = 1 THEN 1 ELSE -1 END) != 0
    ),
    norms AS (SELECT id, CAST(SUM(w * w) AS BIGINT) AS norm2 FROM emb GROUP BY id),
    qv AS (SELECT dim, w AS qw FROM emb WHERE id = 0),
    qn AS (SELECT norm2 AS qnorm2 FROM norms WHERE id = 0),
    dots AS (
      SELECT e.id, CAST(SUM(e.w * q.qw) AS BIGINT) AS dot
      FROM emb e JOIN qv q USING (dim) WHERE e.id != 0 GROUP BY e.id
    ),
    ann_scores AS (
      SELECT d.id, d.dot, n.norm2,
             CAST(ROUND(d.dot / sqrt(CAST(n.norm2 * qn.qnorm2 AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS cos_micro
      FROM dots d JOIN norms n USING (id), qn
    )
"""


@query(
    "text_hashed_ann_topk",
    oracle=f"""
    WITH {_ANN_BODY}
    SELECT id, dot, norm2, cos_micro FROM ann_scores
    ORDER BY cos_micro DESC, id ASC
    LIMIT 20
    """,
)
def text_hashed_ann_topk(spark, sf_dir):
    """Nearest neighbors of doc 0 from raw text alone: feature-hashed
    embeddings -> broadcast sparse dot product -> TakeOrdered top-k.  Only
    IEEE-exact float ops (sqrt, divide) touch the integer dot/norms, so the
    micro-rounded cosine hash-matches the oracle."""
    docs = T(spark, sf_dir, "documents")
    emb = X.hashed_embedding(docs, "doc_id", "text", dims=64)
    return X.hashed_cosine_topk(emb, query_id=0, k=20)


@query(
    "text_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_BODY},
    {_ANN_BODY},
    bmtop AS (
      SELECT id, score_micro FROM bm25_scores
      ORDER BY score_micro DESC, id LIMIT 50
    ),
    antop AS (
      SELECT id, cos_micro FROM ann_scores
      ORDER BY cos_micro DESC, id LIMIT 50
    ),
    bmr AS (
      SELECT id, CAST(row_number() OVER (ORDER BY score_micro DESC, id) AS BIGINT) AS r
      FROM bmtop
    ),
    anr AS (
      SELECT id, CAST(row_number() OVER (ORDER BY cos_micro DESC, id) AS BIGINT) AS r
      FROM antop
    ),
    u AS (
      SELECT id, r, CAST(ROUND(1e9 / (60e0 + r)) AS BIGINT) AS c, 0 AS src FROM bmr
      UNION ALL
      SELECT id, r, CAST(ROUND(1e9 / (60e0 + r)) AS BIGINT) AS c, 1 AS src FROM anr
    )
    SELECT id, CAST(SUM(c) AS BIGINT) AS rrf_micro,
           MAX(CASE WHEN src = 0 THEN r END) AS score_micro_rank,
           MAX(CASE WHEN src = 1 THEN r END) AS cos_micro_rank
    FROM u GROUP BY id
    ORDER BY rrf_micro DESC, id LIMIT 20
    """,
)
def text_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 keyword candidates + hashed-embedding ANN
    candidates for doc 0, fused by reciprocal-rank fusion (k0=60) — the
    standard RAG hybrid-search combiner.  The corpus-sized work happens in
    the two retrievers (each already a measured query); fusion ranks two
    50-row candidate lists and sums integer micro-contributions, so the
    fused ordering is cross-engine exact."""
    docs = T(spark, sf_dir, "documents")
    bm = X.bm25_topk(
        docs, "doc_id", "text", _BM25_TERMS, k1=_BM25_K1, b=_BM25_B, k=50
    ).select("id", "score_micro")
    emb = X.hashed_embedding(docs, "doc_id", "text", dims=64)
    ann = X.hashed_cosine_topk(emb, query_id=0, k=50).select("id", "cos_micro")
    return X.rrf_fuse([(bm, "score_micro"), (ann, "cos_micro")], k0=60, k=20)


@query(
    "text_gopher_rules",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id AS id,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT) END AS n_words,
        CAST(length(regexp_replace(text, '\s+', '', 'g')) AS INT) AS n_nonspace,
        CAST(length(text) - length(replace(text, '#', '')) AS INT) AS n_hash,
        CAST((length(text) - length(replace(text, '...', ''))) // 3 AS INT) AS n_ell3,
        CAST(length(text) - length(replace(text, '…', '')) AS INT) AS n_ellu,
        CASE WHEN length(trim(text)) = 0 THEN 0
             ELSE CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                       w -> regexp_matches(w, '[A-Za-z]'))) AS INT) END
          AS n_alpha_words,
        CAST(len(string_split(text, chr(10))) AS INT) AS n_lines,
        CAST(len(list_filter(string_split(text, chr(10)),
                             l -> regexp_matches(l, '^\s*[-*•]'))) AS INT) AS n_bullet,
        CAST(len(list_filter(string_split(text, chr(10)),
                             l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS INT) AS n_ell_lines,
        CAST(len(list_filter(['the','and','of','to','a'],
                             s -> list_contains(string_split_regex(trim(lower(text)), '\s+'), s)))
             AS INT) AS n_stop
      FROM documents
    )
    SELECT id, n_words,
      n_words >= 50 AND n_words <= 100000 AS rule_word_count,
      n_words > 0 AND 3 * n_words <= n_nonspace AND n_nonspace <= 10 * n_words
        AS rule_mean_word_len,
      10 * (n_hash + n_ell3 + n_ellu) <= n_words AS rule_symbol_ratio,
      n_words > 0 AND 5 * n_alpha_words >= 4 * n_words AS rule_alpha_words,
      10 * n_bullet <= 9 * n_lines AS rule_bullets,
      10 * n_ell_lines <= 3 * n_lines AS rule_ellipsis_lines,
      n_stop >= 2 AS rule_stopwords,
      (n_words >= 50 AND n_words <= 100000)
        AND (n_words > 0 AND 3 * n_words <= n_nonspace AND n_nonspace <= 10 * n_words)
        AND (10 * (n_hash + n_ell3 + n_ellu) <= n_words)
        AND (n_words > 0 AND 5 * n_alpha_words >= 4 * n_words)
        AND (10 * n_bullet <= 9 * n_lines)
        AND (10 * n_ell_lines <= 3 * n_lines)
        AND (n_stop >= 2) AS pass_gopher
    FROM feats
    """,
)
def text_gopher_rules(spark, sf_dir):
    """Gopher-style composite quality rules as pure integer arithmetic —
    a map-only pre-dedup filter pass (operators/text.py:gopher_rules)."""
    return X.gopher_rules(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_ngram_novelty",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    pairs AS (
      SELECT DISTINCT id,
             md5(array_to_string(list_slice(t, i.i, i.i + 2), ' ')) AS g
      FROM toks, UNNEST(range(1, len(t) - 1)) AS i(i)
      WHERE len(t) >= 3
    ),
    fst AS (SELECT g, MIN(id) AS first_id FROM pairs GROUP BY g),
    per_doc AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN id = first_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      FROM pairs JOIN fst USING (g) GROUP BY id
    )
    SELECT d.doc_id AS id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.n_novel, 0) AS n_novel,
           CASE WHEN p.n_grams IS NOT NULL
                THEN CAST(ROUND(p.n_novel * 1000000.0 / p.n_grams) AS BIGINT) END
             AS novelty_micro
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.id
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Corpus-level 3-gram novelty (earliest-occurrence attribution): the
    memorization/boilerplate score twin of dedup_span_coverage — one
    (digest, id) shuffle, never text (operators/text.py:ngram_novelty)."""
    return X.ngram_novelty(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_token_entropy",
    oracle=r"""
    WITH tk AS (
      SELECT id, tok FROM (
        SELECT doc_id AS id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    tf AS (SELECT id, tok, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
    n AS (SELECT id, CAST(SUM(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
    term AS (
      SELECT tf.id, n.n,
             CAST(ROUND(-(CAST(tf.tf AS DOUBLE) / n.n)
                        * log10(CAST(tf.tf AS DOUBLE) / n.n) * 1000000, 0)
                  AS BIGINT) AS q
      FROM tf JOIN n ON n.id = tf.id
    )
    SELECT id,
           CAST(MIN(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(q) AS BIGINT) AS entropy_micro
    FROM term
    GROUP BY id
    """,
)
def text_token_entropy(spark, sf_dir):
    """Per-doc token entropy (vocabulary diversity / gibberish signal) via
    the quantize-then-BIGINT-sum house pattern
    (operators/text.py:token_entropy)."""
    return X.token_entropy(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_bigram_logprob",
    oracle=r"""
    WITH base AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents WHERE length(trim(text)) > 0
    ),
    tk AS (SELECT id, unnest(t) AS tok FROM base),
    uni AS (SELECT tok, COUNT(*) AS cu FROM tk GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM tk),
    pairs AS (
      SELECT id, t[i.i] AS w1, t[i.i + 1] AS w2
      FROM base, UNNEST(range(1, len(t))) AS i(i)
      WHERE len(t) >= 2
    ),
    tf AS (SELECT id, w1, w2, COUNT(*) AS tf FROM pairs GROUP BY 1, 2, 3),
    cb AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cb FROM tf GROUP BY 1, 2),
    q AS (
      SELECT cb.w1, cb.w2,
             CAST(ROUND(log10(0.7 * CAST(cb.cb AS DOUBLE) / u1.cu
                              + 0.3 * CAST(u2.cu AS DOUBLE) / tot.total)
                        * 1000000, 0) AS BIGINT) AS qlp
      FROM cb
      JOIN uni u1 ON u1.tok = cb.w1
      JOIN uni u2 ON u2.tok = cb.w2
      CROSS JOIN tot
    )
    SELECT tf.id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(tf.tf * q.qlp) AS BIGINT) AS sum_logprob_micro
    FROM tf JOIN q ON q.w1 = tf.w1 AND q.w2 = tf.w2
    GROUP BY tf.id
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """CCNet-style interpolated bigram LM quality score
    (operators/text.py:bigram_logprob) — all shuffles term/bigram-keyed."""
    return X.bigram_logprob(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_pmi_cooccurrence",
    oracle=r"""
    WITH inc AS (
      SELECT DISTINCT id, tok FROM (
        SELECT doc_id AS id,
               UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok != ''
    ),
    docfreq AS (SELECT tok, COUNT(*) AS df_ FROM inc GROUP BY tok),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    kept AS (
      SELECT inc.id, inc.tok, d.df_
      FROM inc JOIN docfreq d USING (tok) CROSS JOIN nd
      WHERE d.df_ >= 2 AND d.df_ * 1000000 <= 900000 * nd.n_docs
    ),
    pr AS (
      SELECT a.tok AS t1, b.tok AS t2,
             CAST(COUNT(*) AS BIGINT) AS n_pair,
             CAST(MIN(a.df_) AS BIGINT) AS df1,
             CAST(MIN(b.df_) AS BIGINT) AS df2
      FROM kept a JOIN kept b ON a.id = b.id AND a.tok < b.tok
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT t1, t2, n_pair, df1, df2, nd.n_docs,
           CAST(n_pair * nd.n_docs * 1000000 // (df1 * df2) AS BIGINT) AS lift_ppm
    FROM pr CROSS JOIN nd
    ORDER BY lift_ppm DESC, t1, t2
    LIMIT 100
    """,
)
def text_pmi_cooccurrence(spark, sf_dir):
    """Top-100 document-level PMI collocations, ranked by the exact integer
    lift (ppm of the independence expectation) so no float log ever feeds
    an ordering (operators/text.py:pmi_cooccurrence).  Scale: df-gated pair
    generation, one (t1, t2) shuffle, TakeOrderedAndProject top-k."""
    return X.pmi_cooccurrence(
        T(spark, sf_dir, "documents"), "doc_id", "text",
        min_df=2, max_df_ppm=900_000, min_pair=2, top_k=100,
    )


@query(
    "text_c4_filters",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id AS id,
        CAST(len(string_split(text, chr(10))) AS INT) AS n_lines,
        CAST(len(list_filter(string_split(text, chr(10)),
                 l -> len(string_split_regex(trim(l), '\s+')) >= 5
                      AND regexp_matches(l, '[.!?"]\s*$'))) AS INT) AS n_good_lines,
        CAST(len(string_split_regex(text, '[.!?]')) - 1 AS INT) AS n_sentences,
        contains(lower(text), 'lorem ipsum') AS has_lorem,
        contains(text, '{') AS has_brace,
        CAST(len(list_filter(string_split(text, chr(10)),
                 l -> contains(lower(l), 'javascript'))) AS INT) AS n_js_lines,
        (contains(lower(text), 'terms of use')
         OR contains(lower(text), 'privacy policy')
         OR contains(lower(text), 'cookie policy')
         OR contains(lower(text), 'uses cookies')) AS has_policy
      FROM documents
    )
    SELECT id, n_lines, n_good_lines, n_sentences,
      n_good_lines >= 3 AS rule_good_lines,
      n_sentences >= 3 AS rule_min_sentences,
      NOT has_lorem AS rule_no_lorem,
      NOT has_brace AS rule_no_brace,
      n_js_lines = 0 AS rule_no_javascript,
      NOT has_policy AS rule_no_policy,
      (n_good_lines >= 3) AND (n_sentences >= 3) AND NOT has_lorem
        AND NOT has_brace AND (n_js_lines = 0) AND NOT has_policy AS pass_c4
    FROM feats
    """,
)
def text_c4_filters(spark, sf_dir):
    """C4-style page filters (retained-line count, sentence minimum,
    lorem-ipsum / brace / javascript / policy markers) — map-only integer
    arithmetic, the line-shaped companion to text_gopher_rules
    (operators/text.py:c4_filters)."""
    return X.c4_filters(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "text_ccnet_bucket",
    oracle=r"""
    WITH tk AS (
      SELECT id, tok FROM (
        SELECT doc_id AS id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    tf AS (SELECT id, tok, COUNT(*) AS tf FROM tk GROUP BY 1, 2),
    cnt AS (SELECT tok, COUNT(*) AS cnt FROM tk GROUP BY 1),
    tot AS (SELECT COUNT(*) AS total FROM tk),
    q AS (
      SELECT tok,
             CAST(ROUND(log10(CAST(cnt AS DOUBLE) / total) * 1000000, 0) AS BIGINT)
               AS qlog
      FROM cnt CROSS JOIN tot
    ),
    lp AS (
      SELECT tf.id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             ROUND(CAST(SUM(tf.tf * q.qlog) AS DOUBLE) /
                   CAST(SUM(tf.tf) AS BIGINT) / 1000000.0, 4) AS mean_logprob
      FROM tf JOIN q ON q.tok = tf.tok
      GROUP BY tf.id
    ),
    ranked AS (
      SELECT lp.id, d.lang, lp.n_tokens, lp.mean_logprob,
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY lp.mean_logprob DESC, lp.id) AS t
      FROM lp JOIN documents d ON d.doc_id = lp.id
    )
    SELECT id, lang, n_tokens, mean_logprob,
           CASE WHEN t = 1 THEN 'head' WHEN t = 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """,
)
def text_ccnet_bucket(spark, sf_dir):
    """CCNet head/middle/tail triage: per-language LM-score thirds with a
    doc-id tie-break so the NTILE boundary is engine-exact
    (operators/text.py:ccnet_buckets)."""
    return X.ccnet_buckets(
        T(spark, sf_dir, "documents"), "doc_id", "text", "lang"
    )


def _bpe_oracle(n_merges: int) -> str:
    """DuckDB CTE chain reproducing `bpe_train_merges` bit-for-bit: the
    same packed \\x01sym\\x02 representation, the same left-to-right
    replace() merge rule, the same (count DESC, l, r) tie-break —
    iterations unrolled as v_k / p_k / b_k CTE triples."""
    parts = [
        r"""
    w0 AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
            FROM documents) u
      WHERE length(w) > 0 GROUP BY w
    ),
    v1 AS (
      SELECT cnt,
             array_to_string(list_transform(
               list_filter(string_split(w, ''), c -> c != ''),
               c -> chr(1) || c || chr(2)), '') AS packed
      FROM w0
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(f"""
    p{k} AS (
      SELECT syms[i] AS l, syms[i + 1] AS r, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (SELECT cnt,
                   list_filter(string_split(replace(packed, chr(1), ''), chr(2)),
                               s -> s != '') AS syms
            FROM v{k}) x,
           UNNEST(generate_series(1, len(syms) - 1)) AS t(i)
      WHERE len(syms) >= 2
      GROUP BY 1, 2
    ),
    b{k} AS (
      SELECT {k} AS merge_rank, l AS left_sym, r AS right_sym,
             l || r AS merged, pair_count
      FROM p{k} ORDER BY pair_count DESC, l, r LIMIT 1
    )""")
        if k < n_merges:
            parts.append(f"""
    v{k + 1} AS (
      SELECT v.cnt,
             replace(v.packed,
                     chr(1) || b.left_sym || chr(2) || chr(1) || b.right_sym || chr(2),
                     chr(1) || b.merged || chr(2)) AS packed
      FROM v{k} v CROSS JOIN b{k} b
    )""")
    union = " UNION ALL ".join(f"SELECT * FROM b{k}" for k in range(1, n_merges + 1))
    return "WITH " + ",".join(parts) + f" {union}"


@query("text_bpe_train", oracle=_bpe_oracle(3))
def text_bpe_train(spark, sf_dir):
    """Train the first 3 BPE merges on the corpus (tokenizer induction —
    `text_bpe_token_count` applies a FIXED regex; this LEARNS the
    vocabulary).  Corpus-sized work is the one word-count shuffle; each
    merge iterates on the distinct-word table (vocabulary-sized) with a
    1-row argmax collect, the sanctioned kmeans_train iterative shape."""
    return X.bpe_train_merges(T(spark, sf_dir, "documents"), "doc_id", "text", n_merges=3)


def _bpe_segment_oracle(n_merges: int) -> str:
    """Train CTEs from `_bpe_oracle` + map-side application to documents:
    pack doc text (chr(3) word separator), apply the learned merges in
    rank order, count surviving chr(2) symbol terminators."""
    train = _bpe_oracle(n_merges)
    train_with = train[: train.rindex(" SELECT * FROM b1")]
    apply_ctes = [f"""
    d1 AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                  w -> w != '')) AS INT) AS n_words,
             array_to_string(list_transform(
               list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> w != ''),
               w -> array_to_string(list_transform(
                      list_filter(string_split(w, ''), c -> c != ''),
                      c -> chr(1) || c || chr(2)), '')), chr(3)) AS packed
      FROM documents
    )"""]
    for k in range(1, n_merges + 1):
        apply_ctes.append(f"""
    d{k + 1} AS (
      SELECT d.doc_id, d.n_words,
             replace(d.packed,
                     chr(1) || b.left_sym || chr(2) || chr(1) || b.right_sym || chr(2),
                     chr(1) || b.merged || chr(2)) AS packed
      FROM d{k} d CROSS JOIN b{k} b
    )""")
    final = (
        f"SELECT doc_id, n_words, CAST(length(packed) - "
        f"length(replace(packed, chr(2), '')) AS BIGINT) AS n_bpe_tokens "
        f"FROM d{n_merges + 1}"
    )
    return train_with + "," + ",".join(apply_ctes) + " " + final


@query("text_bpe_segment", oracle=_bpe_segment_oracle(3))
def text_bpe_segment(spark, sf_dir):
    """Token accounting under the corpus's OWN trained tokenizer: train 3
    BPE merges (`text_bpe_train`), then apply them map-side and count
    per-doc BPE tokens — the budget number a `n^alpha` mixture or
    `pack_sequences` actually needs.  Application is shuffle-free
    (packed-string replaces); training cost is the one word-count shuffle
    plus vocab-sized iterations."""
    docs = T(spark, sf_dir, "documents")
    trained = X.bpe_train_merges(docs, "doc_id", "text", n_merges=3)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in trained.orderBy("merge_rank").collect()
    ]
    out = X.bpe_segment_counts(docs, "doc_id", "text", merges)
    return out.select(F.col("id").alias("doc_id"), "n_words", "n_bpe_tokens")


def _bpe_pack_oracle(n_merges: int, budget: int) -> str:
    """BPE segment-count CTEs + the pack_sequences window prefix-sum."""
    seg = _bpe_segment_oracle(n_merges)
    head = seg[: seg.rindex("SELECT doc_id, n_words,")].rstrip()
    return head + f""",
    counts AS (
      SELECT doc_id,
             CAST(length(packed) - length(replace(packed, chr(2), ''))
                  AS BIGINT) AS n_tokens
      FROM d{n_merges + 1}
    ),
    cum AS (
      SELECT d.lang, c.doc_id, c.n_tokens,
             COALESCE(SUM(c.n_tokens) OVER (PARTITION BY d.lang
                       ORDER BY c.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev
      FROM counts c JOIN documents d USING (doc_id)
    )
    SELECT lang, doc_id, n_tokens,
           CAST(prev // {budget} AS BIGINT) AS bin_id,
           CAST(prev - (prev // {budget}) * {budget} AS BIGINT) AS bin_offset
    FROM cum
    """


@query("pipeline_bpe_pack", oracle=_bpe_pack_oracle(3, 256))
def pipeline_bpe_pack(spark, sf_dir):
    """Tokenizer-aware sequence packing end to end: train 3 BPE merges on
    the corpus, count each document's tokens UNDER THAT TOKENIZER
    (map-side packed-string replaces), and pack into 256-token bins per
    language — the budget the training loader actually fills, not a
    whitespace proxy.  Composition of text_bpe_train + text_bpe_segment +
    pack_sequences; one window shuffle on the partition key after the
    word-count shuffle, everything else map-side."""
    from trough_spark.operators import sampling as SA

    docs = T(spark, sf_dir, "documents")
    trained = X.bpe_train_merges(docs, "doc_id", "text", n_merges=3)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in trained.orderBy("merge_rank").collect()
    ]
    counts = X.bpe_segment_counts(docs, "doc_id", "text", merges).select(
        F.col("id").alias("doc_id"), F.col("n_bpe_tokens").alias("n_tokens")
    )
    toks = counts.join(docs.select("doc_id", "lang"), "doc_id")
    return SA.pack_sequences(
        toks, "doc_id", "n_tokens", budget=256, partition_by="lang"
    )


def _bpe_ids_ctes(n_merges: int) -> str:
    """Train + apply CTEs (from `_bpe_segment_oracle`) extended with the
    vocabulary id assignment (`bpe_vocab` twin: distinct corpus chars in
    sorted order from 0, then merges in rank order) and the per-doc symbol
    sequence — shared by the encode and pack-ids oracles."""
    seg = _bpe_segment_oracle(n_merges)
    head = seg[: seg.rindex("SELECT doc_id, n_words,")].rstrip()
    merged_union = " UNION ALL ".join(
        f"SELECT * FROM b{k}" for k in range(1, n_merges + 1)
    )
    return head + f""",
    chars AS (
      SELECT DISTINCT c AS symbol
      FROM (SELECT unnest(list_filter(string_split(w, ''), c -> c != '')) AS c
            FROM w0)
    ),
    char_ids AS (
      SELECT symbol,
             CAST(row_number() OVER (ORDER BY symbol) - 1 AS INT) AS token_id
      FROM chars
    ),
    merge_ids AS (
      SELECT m.merged AS symbol,
             CAST((SELECT COUNT(*) FROM chars) + m.merge_rank - 1 AS INT)
               AS token_id
      FROM ({merged_union}) m
    ),
    vocab AS (SELECT * FROM char_ids UNION ALL SELECT * FROM merge_ids),
    vmap AS (
      SELECT map(list(symbol ORDER BY token_id),
                 list(token_id ORDER BY token_id)) AS m
      FROM vocab
    ),
    toks AS (
      SELECT doc_id,
             list_filter(
               string_split(replace(replace(packed, chr(1), ''), chr(3), ''),
                            chr(2)),
               s -> s != '') AS syms
      FROM d{n_merges + 1}
    ),
    enc AS (
      SELECT t.doc_id,
             CAST(len(t.syms) AS BIGINT) AS n_tokens,
             array_to_string(
               list_transform(t.syms,
                 s -> CAST(coalesce(map_extract(v.m, s)[1], -1) AS VARCHAR)),
               ',') AS token_ids
      FROM toks t CROSS JOIN vmap v
    )"""


def _bpe_encode_oracle(n_merges: int) -> str:
    return _bpe_ids_ctes(n_merges) + " SELECT doc_id, n_tokens, token_ids FROM enc"


@query("text_bpe_encode", oracle=_bpe_encode_oracle(3))
def text_bpe_encode(spark, sf_dir):
    """Encode every document to BPE token IDS under the corpus's own
    trained tokenizer: train 3 merges (`text_bpe_train`), export the
    vocabulary (`bpe_vocab`: corpus chars sorted from id 0, merges in
    rank order), and map each doc's merged symbol sequence through the
    id table — the (id, token_ids) shard a training loader consumes,
    where `text_bpe_segment` only produced counts.  token_ids is emitted
    comma-joined for the hash gate.

    Scale: training is the one word-count shuffle + vocab-sized
    iterations; the vocab collect is vocabulary-sized (the broadcast-
    codebook pattern); encoding is ENTIRELY map-side (packed-string
    replaces + a constant map literal — zero Exchange, asserted in
    test_plans)."""
    docs = T(spark, sf_dir, "documents")
    trained = X.bpe_train_merges(docs, "doc_id", "text", n_merges=3)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in trained.orderBy("merge_rank").collect()
    ]
    vocab = {
        r["symbol"]: r["token_id"]
        for r in X.bpe_vocab(docs, "text", merges).collect()
    }
    enc = X.bpe_encode_ids(docs, "doc_id", "text", merges, vocab)
    return enc.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.concat_ws(
            ",", F.transform("token_ids", lambda i: i.cast("string"))
        ).alias("token_ids"),
    )


def _bpe_pack_ids_oracle(n_merges: int, budget: int) -> str:
    return _bpe_ids_ctes(n_merges) + f""",
    cum AS (
      SELECT d.lang, e.doc_id, e.n_tokens, e.token_ids,
             COALESCE(SUM(e.n_tokens) OVER (PARTITION BY d.lang
                       ORDER BY e.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev
      FROM enc e JOIN documents d USING (doc_id)
    )
    SELECT lang, doc_id, n_tokens,
           CAST(prev // {budget} AS BIGINT) AS bin_id,
           CAST(prev - (prev // {budget}) * {budget} AS BIGINT) AS bin_offset,
           token_ids
    FROM cum
    """


@query("pipeline_bpe_pack_ids", oracle=_bpe_pack_ids_oracle(3, 256))
def pipeline_bpe_pack_ids(spark, sf_dir):
    """The full tokenizer-to-loader pipeline with REAL token ids: train 3
    BPE merges, encode every doc to ids (`text_bpe_encode`), and pack into
    256-token bins per language with the id payload CARRIED through the
    packing window (pack_sequences ``carry=`` — no rejoin, no second
    shuffle).  This is `pipeline_bpe_pack` upgraded from token counts to
    the actual (bin, offset, ids) shards a training loader writes.

    Scale: one word-count shuffle (training), map-side encode, ONE window
    shuffle on the partition key carrying (lang, doc_id, n_tokens, ids)."""
    from trough_spark.operators import sampling as SA

    docs = T(spark, sf_dir, "documents")
    trained = X.bpe_train_merges(docs, "doc_id", "text", n_merges=3)
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in trained.orderBy("merge_rank").collect()
    ]
    vocab = {
        r["symbol"]: r["token_id"]
        for r in X.bpe_vocab(docs, "text", merges).collect()
    }
    enc = X.bpe_encode_ids(docs, "doc_id", "text", merges, vocab).select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.concat_ws(
            ",", F.transform("token_ids", lambda i: i.cast("string"))
        ).alias("token_ids"),
    )
    toks = enc.join(docs.select("doc_id", "lang"), "doc_id")
    return SA.pack_sequences(
        toks, "doc_id", "n_tokens", budget=256, partition_by="lang",
        carry=["token_ids"],
    )
