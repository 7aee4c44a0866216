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
