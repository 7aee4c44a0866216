"""End-to-end corpus curation: one query composing quality filtering,
near-dup clustering, contamination screening, and dataset splitting into a
per-document retention decision — the full pass a training-data pipeline
runs before shipping a corpus.

Everything is a composition of already-oracled operators (quality
features, MinHash-LSH + connected components, shingle contamination, hash
split), so the giant DuckDB oracle below is assembled from the same CTE
fragments.  At 100 TB each stage keeps its own scale shape (map-side
quality, banded LSH joins, broadcast benchmark shingles, map-side split);
the final assembly is a handful of id-keyed joins.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import dedup as D
from trough_spark.operators import graph as G
from trough_spark.operators import sampling as SA
from trough_spark.operators import text as X
from trough_spark.queries import query
from trough_spark.queries.dedup import _LSH_PAIRS_CTE
from trough_spark.queries.sampling import _SPLIT_WEIGHTS, _split_case
from trough_spark.queries.text import _EN
from trough_spark.tables import load_table as T

_CONTAMINATION_MAX = 0.1


@query(
    "pipeline_curation",
    oracle=rf"""
    WITH RECURSIVE {_LSH_PAIRS_CTE},
    edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION ALL
      SELECT id2 AS a, id1 AS b FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS canonical_id FROM reach GROUP BY id),
    feats AS (
      SELECT doc_id AS id,
             CAST(length(text) AS INT) AS n_chars,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS INT) END AS n_tokens,
             CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS INT) AS n_alpha,
             CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                  t -> list_contains({_EN}, t))) AS INT) AS n_stopwords
      FROM documents
    ),
    qual AS (
      SELECT id,
             CASE WHEN n_tokens < 5 THEN 'too_short'
                  WHEN n_alpha / greatest(n_chars, 1) < 0.6 THEN 'low_alpha'
                  WHEN n_stopwords = 0 THEN 'no_stopwords'
                  ELSE 'ok' END AS quality_bucket
      FROM feats
    ),
    bench AS (SELECT DISTINCT sh FROM sh WHERE id < 25),
    corp AS (SELECT id, sh FROM sh WHERE id >= 25),
    hits AS (
      SELECT c.id, COUNT(*) AS n_overlap
      FROM corp c JOIN bench b ON b.sh = c.sh GROUP BY c.id
    ),
    per AS (SELECT id, COUNT(*) AS n_shingles FROM corp GROUP BY id),
    cont AS (
      SELECT p.id,
             ROUND(COALESCE(h.n_overlap, 0) / CAST(p.n_shingles AS DOUBLE), 4)
               AS contamination
      FROM per p LEFT JOIN hits h ON h.id = p.id
    ),
    decided AS (
      SELECT d.doc_id,
             CASE WHEN d.doc_id < 25 THEN 'benchmark'
                  WHEN q.quality_bucket != 'ok' THEN 'drop_quality'
                  WHEN c.canonical_id != d.doc_id THEN 'drop_duplicate'
                  WHEN COALESCE(ct.contamination, 0) > {_CONTAMINATION_MAX}
                    THEN 'drop_contaminated'
                  ELSE 'keep' END AS decision
      FROM documents d
      JOIN qual q ON q.id = d.doc_id
      JOIN comp c ON c.doc_id = d.doc_id
      LEFT JOIN cont ct ON ct.id = d.doc_id
    )
    SELECT doc_id, decision,
           CASE WHEN decision = 'keep' THEN {_split_case()} END AS split
    FROM decided
    """,
)
def pipeline_curation(spark, sf_dir):
    """Per-document retention decision: benchmark docs (id < 25) are set
    aside; the rest must pass the C4-style quality gate, be the canonical
    member of their near-dup cluster, and show <= 10% benchmark-shingle
    contamination; survivors get a reproducible train/val/test split."""
    docs = T(spark, sf_dir, "documents")
    ids = docs.select("doc_id")

    qual = X.quality_features(docs, "doc_id", "text").select(
        F.col("id").alias("doc_id"), "quality_bucket"
    )
    # ONE tokenize+explode+dedup pass of the corpus feeds BOTH the minhash
    # stage (MIN is duplicate-insensitive, so the deduped table is
    # bit-identical input) and the contamination stage (which needs the
    # per-doc-distinct set anyway) — at 100 TB the text scan is the cost,
    # and this halves it.  Checkpointed so the pass executes once, not once
    # per consumer; the oracle's shared `sh` CTE mirrors the reuse.
    sh = D.shingle_table(docs, "doc_id", "text", n=3).localCheckpoint(eager=False)
    sig_vec = D.minhash_signature_vector(docs, "doc_id", "text", num_perm=8, n=3, shingles=sh)
    pairs = D.minhash_lsh_candidates_wide(sig_vec, num_perm=8, rows_per_band=2)
    comp = G.connected_components(ids, pairs, id_col="doc_id").select(
        F.col("id").alias("doc_id"), F.col("comp").alias("canonical_id")
    )
    cont = X.contamination(
        docs.filter(F.col("doc_id") >= 25),
        docs.filter(F.col("doc_id") < 25),
        "doc_id",
        "text",
        n=3,
        corpus_shingles=sh.filter(F.col("id") >= 25),
        benchmark_shingles=sh.filter(F.col("id") < 25),
    ).select(F.col("id").alias("doc_id"), "contamination")
    split = SA.hash_split(ids, "doc_id", _SPLIT_WEIGHTS).select(
        "doc_id", F.col("split").alias("_split")
    )

    decision = (
        F.when(F.col("doc_id") < 25, "benchmark")
        .when(F.col("quality_bucket") != "ok", "drop_quality")
        .when(F.col("canonical_id") != F.col("doc_id"), "drop_duplicate")
        .when(
            F.coalesce(F.col("contamination"), F.lit(0.0)) > _CONTAMINATION_MAX,
            "drop_contaminated",
        )
        .otherwise("keep")
    )
    return (
        ids.join(qual, "doc_id")
        .join(comp, "doc_id")
        .join(cont, "doc_id", "left")
        .join(split, "doc_id")
        .select(
            "doc_id",
            decision.alias("decision"),
            F.when(decision == "keep", F.col("_split")).alias("split"),
        )
    )


@query(
    "pipeline_url_dedup",
    oracle=r"""
    WITH urls AS (
      SELECT doc_id, n_chars,
             CASE WHEN doc_id % 2 = 0
                  THEN 'https://WWW.' || source || '.Example.COM'
                  ELSE 'https://' || source || '.example.com' END
               || '/page/' || (doc_id % 23)
               || '?utm_source=' || lang || '&utm_campaign=c' || doc_id AS url
      FROM documents
    ),
    parts AS (
      SELECT doc_id, n_chars,
             regexp_replace(
               lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
               '^www\.', '') AS host,
             regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path
      FROM urls
    ),
    keyed AS (
      SELECT doc_id, n_chars,
             array_to_string(list_reverse(string_split(host, '.')), ',')
               || ')' || path AS surt
      FROM parts
    )
    SELECT surt,
           COUNT(*) AS n_dups,
           arg_max(doc_id, n_chars * 10000000000 - doc_id) AS keep_id,
           MAX(n_chars) AS keep_chars
    FROM keyed
    GROUP BY surt
    """,
)
def pipeline_url_dedup(spark, sf_dir):
    """URL-canonical dedup, keep-best: synthesize colliding captures (the
    documents table has no real URLs; a couple dozen docs share each canonical page,
    differing only in host case, a www prefix, and utm_* tracking params),
    SURT-canonicalize, then keep the longest document per canonical key
    (ties to the smallest doc_id) — the CommonCrawl-style recrawl-collapse
    step between exact dedup and near-dup.

    Scale: canonicalization is map-only (`surt_canonicalize`, no UDF); the
    ONE shuffle is a partial-aggregable groupBy on the surt key carrying
    (surt, doc_id, n_chars) — `max_by` with an exact integer composite
    ordering key (n_chars * 1e10 - doc_id fits a long: n_chars < 1e6,
    doc_id < 1e9) instead of a per-key window sort, so map-side combine
    collapses each key to one row before the exchange.  The surt key is
    also the natural range-partitioning for per-domain locality at 100 TB.
    """
    docs = T(spark, sf_dir, "documents")
    with_url = docs.select(
        "doc_id",
        "n_chars",
        F.concat(
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("https://WWW."), F.col("source"), F.lit(".Example.COM")),
            ).otherwise(
                F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com"))
            ),
            F.lit("/page/"),
            F.col("doc_id") % 23,
            F.lit("?utm_source="),
            F.col("lang"),
            F.lit("&utm_campaign=c"),
            F.col("doc_id"),
        ).alias("url"),
    )
    keyed = X.surt_canonicalize(with_url, "url")
    return keyed.groupBy("surt").agg(
        F.count(F.lit(1)).alias("n_dups"),
        F.expr(
            "max_by(doc_id, n_chars * 10000000000 - doc_id)"
        ).alias("keep_id"),
        F.max("n_chars").alias("keep_chars"),
    )


@query(
    "pipeline_near_dedup",
    oracle=rf"""
    WITH RECURSIVE {_LSH_PAIRS_CTE},
    edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION ALL
      SELECT id2 AS a, id1 AS b FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id),
    best AS (
      SELECT c.cluster_id,
             arg_max(d.doc_id, d.n_chars * 10000000000 - d.doc_id) AS keep_id,
             CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
      GROUP BY 1
    )
    SELECT c.doc_id, c.cluster_id, b.keep_id, b.cluster_size,
           CASE WHEN c.doc_id = b.keep_id THEN 1 ELSE 0 END AS is_kept
    FROM comp c JOIN best b USING (cluster_id)
    """,
)
def pipeline_near_dedup(spark, sf_dir):
    """Quality-aware near-dedup, end to end: MinHash-LSH candidate pairs →
    connected-component closure → keep the HIGHEST-QUALITY member of each
    cluster (longest document, ties to smallest id) — the retention rule
    production pipelines actually use (FineWeb/RefinedWeb keep the best
    member, not the smallest id; `dedup_connected_components` models the
    min-id variant).  Exactness: the arg-max runs on the integer composite
    ``n_chars * 1e10 - doc_id`` (graph.keep_best), no float ordering.

    Scale: the LSH pair join is the data-sized stage (banded equi-join on
    2-row band hashes); the closure iterates over edge-touching nodes only;
    keep_best adds ONE partial-aggregable groupBy on the cluster label plus
    id-keyed joins — document bodies are never shuffled past signing."""
    docs = T(spark, sf_dir, "documents")
    sig_vec = D.minhash_signature_vector(docs, "doc_id", "text", num_perm=8, n=3)
    pairs = D.minhash_lsh_candidates_wide(sig_vec, num_perm=8, rows_per_band=2)
    comp = G.connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
    return G.keep_best(
        docs.select("doc_id", "n_chars"), comp, id_col="doc_id", score_col="n_chars"
    )


def _cluster_split_case() -> str:
    from trough_spark.queries.sampling import _sql_hash

    h = _sql_hash("cluster_id", "split")
    clauses = "".join(
        f"WHEN {h} < {bound} THEN '{name}' "
        for name, bound in SA.split_bounds(_SPLIT_WEIGHTS)
    )
    last = list(_SPLIT_WEIGHTS)[-1]
    return f"CASE {clauses}ELSE '{last}' END"


@query(
    "sample_cluster_split",
    oracle=rf"""
    WITH RECURSIVE {_LSH_PAIRS_CTE},
    edges AS (
      SELECT id1 AS a, id2 AS b FROM pairs
      UNION ALL
      SELECT id2 AS a, id1 AS b FROM pairs
    ),
    reach(id, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.id = e.b
    ),
    comp AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id)
    SELECT doc_id, cluster_id, {_cluster_split_case()} AS split
    FROM comp
    """,
)
def sample_cluster_split(spark, sf_dir):
    """Leakage-safe train/val/test split: the split hash is keyed on the
    NEAR-DUP CLUSTER label, not the document id, so every member of a
    near-duplicate family lands in the same split — the guard against the
    classic eval contamination where a test document's near-copy sits in
    train (hash_split on doc_id gives exactly that failure; this query is
    its cluster-closed replacement).

    Scale: the LSH pair join prices the pass (already the dedup cost);
    the split itself stays a pure map over (doc_id, cluster_id)."""
    docs = T(spark, sf_dir, "documents")
    sig_vec = D.minhash_signature_vector(docs, "doc_id", "text", num_perm=8, n=3)
    pairs = D.minhash_lsh_candidates_wide(sig_vec, num_perm=8, rows_per_band=2)
    comp = G.connected_components(docs.select("doc_id"), pairs, id_col="doc_id")
    labeled = comp.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id")
    )
    return SA.hash_split(labeled, "cluster_id", _SPLIT_WEIGHTS)
