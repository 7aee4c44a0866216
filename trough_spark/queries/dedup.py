"""Deduplication queries over the `documents` table, with DuckDB oracles.

Each query wires an operator from trough_spark.operators.dedup to the
synthetic corpus; the oracle re-derives the identical result in pure SQL
(portable md5-based hashing — see operators/dedup.py docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import dedup as D
from trough_spark.queries import query
from trough_spark.tables import load_table as T

# shared oracle CTEs: tokenization + 3-gram shingles, mirroring
# operators/dedup.py exactly
_A = "[1000003, 999983, 888887, 777767, 666667, 555557, 444443, 333337]"
_B = "[12345, 54321, 192837, 918273, 112358, 853211, 272727, 727272]"
_MINHASH_CTE = rf"""
    h31 AS (
      SELECT id, CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) % 2147483647 AS h31
      FROM sh
    ),
    hashed AS (
      SELECT id, perm,
             ({_A}[perm + 1] * h31 + {_B}[perm + 1]) % 2147483647 AS h
      FROM h31, UNNEST(generate_series(0, 7)) AS t(perm)
    )
"""
_SHINGLES_CTE = r"""
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
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_id
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    return D.exact_dedup(T(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    freq AS (SELECT sh, COUNT(*) AS df_ FROM sh GROUP BY sh),
    kept AS (SELECT sh.id, sh.sh FROM sh JOIN freq USING (sh) WHERE df_ <= 100),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM kept GROUP BY id),
    common AS (
      SELECT a.id AS id1, b.id AS id2, COUNT(*) AS n_common
      FROM kept a JOIN kept b ON a.sh = b.sh AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id1, id2, n_common, s1.n_sh AS n1, s2.n_sh AS n2,
           ROUND(n_common / (s1.n_sh + s2.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes s1 ON s1.id = id1
    JOIN sizes s2 ON s2.id = id2
    WHERE n_common / (s1.n_sh + s2.n_sh - n_common) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(
        T(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5, max_doc_freq=100
    )


@query(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    freq AS (SELECT sh, COUNT(*) AS df_ FROM sh GROUP BY sh),
    kept AS (SELECT sh.id, sh.sh FROM sh JOIN freq USING (sh) WHERE df_ <= 100),
    sizes AS (SELECT id, COUNT(*) AS n_sh FROM kept GROUP BY id),
    common AS (
      SELECT a.id AS id1, b.id AS id2, COUNT(*) AS n_common
      FROM kept a JOIN kept b ON a.sh = b.sh AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT id1, id2, n_common, s1.n_sh AS n1, s2.n_sh AS n2,
           ROUND(n_common / s1.n_sh, 6) AS contain_1_in_2,
           ROUND(n_common / s2.n_sh, 6) AS contain_2_in_1
    FROM common
    JOIN sizes s1 ON s1.id = id1
    JOIN sizes s2 ON s2.id = id2
    WHERE n_common / s1.n_sh >= 0.6 OR n_common / s2.n_sh >= 0.6
    """,
)
def dedup_containment(spark, sf_dir):
    # asymmetric inclusion detection — the directed complement of
    # dedup_ngram_jaccard (a contained quote scores 1.0 here, ~|A|/|B| there)
    return D.ngram_containment_pairs(
        T(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.6, max_doc_freq=100
    )


@query(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_CTE},
    minh AS (SELECT id, perm, MIN(h) AS minhash FROM hashed GROUP BY 1, 2),
    bands AS (
      SELECT id, perm // 2 AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm)) AS band_hash
      FROM minh GROUP BY id, perm // 2
    )
    SELECT DISTINCT a.id AS id1, b.id AS id2
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    # wide path: signature VECTORS (one shuffle, no 8x perm explosion) →
    # map-side band hashes → pair join; proven pair-identical to the
    # long-form path in tests/test_oracle.py
    sig_vec = D.minhash_signature_vector(
        T(spark, sf_dir, "documents"), "doc_id", "text", num_perm=8, n=3
    )
    return D.minhash_lsh_candidates_wide(sig_vec, num_perm=8, rows_per_band=2)


@query(
    "dedup_minhash_signatures",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_CTE}
    SELECT id, perm, MIN(h) AS minhash FROM hashed GROUP BY 1, 2
    """,
)
def dedup_minhash_signatures(spark, sf_dir):
    return D.minhash_signatures(T(spark, sf_dir, "documents"), "doc_id", "text", num_perm=8, n=3)


@query(
    "dedup_simhash",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id AS id, t.tok
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
           UNNEST(toks) AS t(tok)
      WHERE length(t.tok) > 0
    ),
    hashed AS (
      SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok
    ),
    votes AS (
      SELECT id, bit, SUM(((h >> bit) & 1) * 2 - 1) AS v
      FROM hashed, UNNEST(generate_series(0, 31)) AS t(bit)
      GROUP BY 1, 2
    )
    SELECT id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY id
    """,
)
def dedup_simhash(spark, sf_dir):
    return D.simhash(T(spark, sf_dir, "documents"), "doc_id", "text", bits=32)


@query(
    "dedup_keep_first",
    oracle="""
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    JOIN (SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM documents GROUP BY 1) k
      ON d.doc_id = k.keep_id
    """,
)
def dedup_keep_first(spark, sf_dir):
    # The materializing form of exact dedup: keep the canonical survivor rows.
    # Scale: digest groupBy (shuffle of 16-byte keys) + a self-join on doc_id;
    # at 100 TB the join key is the table's natural partitioning column, so
    # this co-locates without an extra shuffle when the table is bucketed.
    d = T(spark, sf_dir, "documents")
    keep = D.exact_dedup(d, "doc_id", "text").select(F.col("keep_id").alias("doc_id"))
    return d.join(keep, "doc_id", "left_semi").select("doc_id", "lang", "source")


_LSH_PAIRS_CTE = f"""
    {_SHINGLES_CTE},
    {_MINHASH_CTE},
    minh AS (SELECT id, perm, MIN(h) AS minhash FROM hashed GROUP BY 1, 2),
    bands AS (
      SELECT id, perm // 2 AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm)) AS band_hash
      FROM minh GROUP BY id, perm // 2
    ),
    pairs AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
    )
"""


@query(
    "dedup_connected_components",
    oracle=f"""
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
    sizes AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
    SELECT c.doc_id, c.canonical_id, s.cluster_size,
           CASE WHEN c.doc_id = c.canonical_id THEN 1 ELSE 0 END AS is_canonical
    FROM comp c JOIN sizes s USING (canonical_id)
    """,
)
def dedup_connected_components(spark, sf_dir):
    """Near-dup clusters: MinHash-LSH candidate pairs closed under
    transitivity (min-label propagation, `operators/graph.py`), then one
    kept doc per cluster.  The oracle computes the same closure with a
    recursive CTE.  This is the retention decision a pair list alone cannot
    make — A~B, B~C collapse to one canonical doc even without an A~C pair."""
    from trough_spark.operators import graph as G

    docs = T(spark, sf_dir, "documents")
    sig_vec = D.minhash_signature_vector(docs, "doc_id", "text", num_perm=8, n=3)
    pairs = D.minhash_lsh_candidates_wide(sig_vec, num_perm=8, rows_per_band=2)
    comp = G.connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id"
    )
    return G.keep_canonical(docs.select("doc_id"), comp, id_col="doc_id")


@query(
    "dedup_simhash_pairs",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id AS id, t.tok
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks FROM documents),
           UNNEST(toks) AS t(tok)
      WHERE length(t.tok) > 0
    ),
    hashed AS (
      SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok
    ),
    votes AS (
      SELECT id, bit, SUM(((h >> bit) & 1) * 2 - 1) AS v
      FROM hashed, UNNEST(generate_series(0, 31)) AS t(bit)
      GROUP BY 1, 2
    ),
    fp AS (
      SELECT id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
               AS simhash
      FROM votes GROUP BY id
    ),
    banded AS (
      SELECT id, simhash, t.band, (simhash >> (t.band * 8)) & 255 AS band_val
      FROM fp, UNNEST(generate_series(0, 3)) AS t(band)
    )
    SELECT DISTINCT a.id AS id1, b.id AS id2,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.band_val = b.band_val AND a.id < b.id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs: band the 32-bit fingerprint into 4 slices,
    equi-join on any identical slice (pigeonhole: Hamming <= 3 guarantees a
    shared band → full recall), verify exact bit_count(xor) distance.  The
    cheapest near-dup join shape at corpus scale: one integer per doc."""
    return D.simhash_pairs(
        T(spark, sf_dir, "documents"), "doc_id", "text",
        bits=32, bands=4, max_hamming=3,
    )


@query(
    "dedup_incremental",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_CTE},
    minh AS (SELECT id, perm, MIN(h) AS minhash FROM hashed GROUP BY 1, 2),
    bands AS (
      SELECT id, perm // 2 AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm)) AS band_hash
      FROM minh GROUP BY id, perm // 2
    )
    SELECT DISTINCT n.id AS new_id, c.id AS corpus_id
    FROM bands n
    JOIN bands c ON n.band = c.band AND n.band_hash = c.band_hash
    WHERE n.id >= 450 AND c.id < 450
    """,
)
def dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup: today's batch (doc_id >= 450) checked
    against the existing corpus (doc_id < 450) — band join is new x corpus
    only, never corpus x corpus; at scale the historical band table is
    persisted and appended, so daily cost tracks the batch size."""
    docs = T(spark, sf_dir, "documents")
    return D.incremental_lsh_candidates(
        docs.filter(F.col("doc_id") >= 450),
        docs.filter(F.col("doc_id") < 450),
        "doc_id",
        "text",
    )


@query(
    "dedup_cc_star",
    oracle=f"""
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
    sizes AS (SELECT canonical_id, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
    SELECT c.doc_id, c.canonical_id, s.cluster_size,
           CASE WHEN c.doc_id = c.canonical_id THEN 1 ELSE 0 END AS is_canonical
    FROM comp c JOIN sizes s USING (canonical_id)
    """,
)
def dedup_cc_star(spark, sf_dir):
    """Same dup-cluster closure as dedup_connected_components, computed by
    alternating large-star/small-star contraction instead of label
    propagation — O(log diameter) rounds on a monotonically shrinking edge
    list, the variant that wins when dup chains run long.  Both algorithms
    must (and do) agree with the recursive-CTE oracle."""
    from trough_spark.operators import graph as G

    docs = T(spark, sf_dir, "documents")
    sig_vec = D.minhash_signature_vector(docs, "doc_id", "text", num_perm=8, n=3)
    pairs = D.minhash_lsh_candidates_wide(sig_vec, num_perm=8, rows_per_band=2)
    comp = G.connected_components_star(docs.select("doc_id"), pairs, id_col="doc_id")
    return G.keep_canonical(docs.select("doc_id"), comp, id_col="doc_id")


@query(
    "dedup_span_coverage",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    ),
    pos AS (
      SELECT id,
             CAST(('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15)) AS BIGINT) AS h
      FROM toks, UNNEST(generate_series(1, greatest(len(toks) - 7, 0))) AS s(i)
    ),
    hot AS (SELECT h FROM pos GROUP BY h HAVING COUNT(DISTINCT id) >= 2),
    dup AS (
      SELECT id, CAST(COUNT(*) AS BIGINT) AS dup_spans
      FROM pos JOIN hot USING (h) GROUP BY id
    ),
    tot AS (
      SELECT id, CAST(greatest(len(toks) - 7, 0) AS BIGINT) AS n_spans
      FROM toks WHERE len(toks) > 7
    )
    SELECT t.id, t.n_spans,
           COALESCE(d.dup_spans, CAST(0 AS BIGINT)) AS dup_spans,
           CAST(ROUND(COALESCE(d.dup_spans, 0) * 1000000.0 / t.n_spans) AS BIGINT) AS dup_ppm
    FROM tot t LEFT JOIN dup d USING (id)
    """,
)
def dedup_span_coverage(spark, sf_dir):
    """Duplicated-span coverage per document (shingle-granular exact-substring
    dedup signal, Lee et al. 2022).  8-token spans are hashed map-side; a span
    is 'duplicated' if it occurs in >= 2 distinct docs.  dup_ppm is the
    integer ppm of a doc's span positions that are duplicated — round-then-
    cast keeps the float bit-identical across engines."""
    return D.duplicated_span_coverage(
        T(spark, sf_dir, "documents"), "doc_id", "text", n=8, min_doc_freq=2
    )


@query(
    "dedup_fuzzy_levenshtein",
    oracle="""
    WITH names AS (
      SELECT MIN(p_partkey) AS id, p_name FROM part GROUP BY p_name
    ),
    t AS (
      SELECT id,
             lower(trim(p_name)) AS name,
             list_last(string_split_regex(trim(lower(p_name)), '\\s+')) AS blk,
             length(lower(trim(p_name))) AS ln
      FROM names
    )
    SELECT a.id AS id_a, b.id AS id_b,
           levenshtein(a.name, b.name) AS dist
    FROM t a
    JOIN t b ON a.blk = b.blk AND a.id < b.id AND abs(a.ln - b.ln) <= 2
    WHERE levenshtein(a.name, b.name) <= 2
    """,
)
def dedup_fuzzy_levenshtein(spark, sf_dir):
    # Entity resolution over DISTINCT part names: dedupe-first (group to
    # unique strings, min partkey as the entity id), then the blocked
    # Levenshtein join.  Matching row INSTANCES instead of distinct strings
    # explodes quadratically in the duplication factor at scale (3M pairs at
    # sf0.1 here) while adding zero information — dedupe-first is the
    # fuzzy-match discipline this query pins.
    # Block on the LAST token (the head noun of "modifier noun" part
    # names): a typo in the modifier still lands in the right block, which
    # first-token blocking would miss — the block-key-choice lesson, live.
    names = (
        T(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").alias("id"))
    )
    blk = F.element_at(F.split(F.trim(F.lower(F.col("p_name"))), r"\s+"), -1)
    return D.fuzzy_levenshtein_pairs(names, "id", "p_name", max_distance=2, block=blk)


@query(
    "dedup_minhash_verify",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_CTE},
    minh AS (SELECT id, perm, MIN(h) AS minhash FROM hashed GROUP BY 1, 2),
    bands AS (
      SELECT id, perm // 2 AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm)) AS band_hash
      FROM minh GROUP BY id, perm // 2
    ),
    cand AS (
      SELECT DISTINCT a.id AS id1, b.id AS id2
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id
    )
    SELECT c.id1, c.id2,
           CAST(SUM(CASE WHEN s1.minhash = s2.minhash THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree,
           ROUND(SUM(CASE WHEN s1.minhash = s2.minhash THEN 1 ELSE 0 END) / 8.0, 6)
             AS est_jaccard
    FROM cand c
    JOIN minh s1 ON s1.id = c.id1
    JOIN minh s2 ON s2.id = c.id2 AND s2.perm = s1.perm
    GROUP BY c.id1, c.id2
    """,
)
def dedup_minhash_verify(spark, sf_dir):
    """The LSH pipeline's verify stage: signature-only Jaccard estimates
    for every banded candidate pair — document bodies are never touched
    after signing, so verification is O(candidates x num_perm) longs
    regardless of document size."""
    docs = T(spark, sf_dir, "documents")
    sig_vec = D.minhash_signature_vector(docs, "doc_id", "text", num_perm=8, n=3)
    cand = D.minhash_lsh_candidates_wide(sig_vec, num_perm=8, rows_per_band=2)
    return D.minhash_jaccard_estimate_wide(sig_vec, cand, num_perm=8)


@query(
    "dedup_chunk_rewrite",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\\s+') AS toks
      FROM documents
    ),
    chunks AS (
      SELECT id, i AS idx,
             md5(array_to_string(toks[(i * 20 + 1):(i * 20 + 20)], ' ')) AS h
      FROM toks,
           UNNEST(generate_series(0, CAST(ceil(len(toks) / 20.0) AS BIGINT) - 1)) AS t(i)
    ),
    win AS (
      -- lexicographic min (id, idx); idx < 2^30 so the composite is exact
      SELECT h, MIN(id * 1073741824 + idx) AS w FROM chunks GROUP BY h
    ),
    kept AS (
      SELECT c.id, c.idx
      FROM chunks c JOIN win USING (h)
      WHERE c.id * 1073741824 + c.idx = win.w
    ),
    rewritten AS (
      SELECT k.id,
             COUNT(*) AS kept_chunks,
             md5(string_agg(
               array_to_string(t.toks[(k.idx * 20 + 1):(k.idx * 20 + 20)], ' '),
               ' ' ORDER BY k.idx)) AS kept_hash
      FROM kept k JOIN toks t ON t.id = k.id
      GROUP BY k.id
    )
    SELECT t.id,
           CAST(ceil(len(t.toks) / 20.0) AS BIGINT) AS n_chunks,
           r.kept_chunks,
           CAST(ROUND(r.kept_chunks * 1000000.0 / ceil(len(t.toks) / 20.0)) AS BIGINT)
             AS kept_ppm,
           r.kept_hash
    FROM toks t JOIN rewritten r ON r.id = t.id
    """,
)
def dedup_chunk_rewrite(spark, sf_dir):
    """Exact-chunk keep-first dedup with rewrite (Lee et al. 2022 shape) —
    the remove side of exact-substring dedup over the documents corpus."""
    return D.chunk_dedup_rewrite(T(spark, sf_dir, "documents"), "doc_id", "text", chunk=20)


@query(
    "dedup_source_matrix",
    oracle=f"""
    WITH {_LSH_PAIRS_CTE}
    SELECT least(d1.source, d2.source) AS source_a,
           greatest(d1.source, d2.source) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN documents d1 ON d1.doc_id = p.id1
    JOIN documents d2 ON d2.doc_id = p.id2
    GROUP BY 1, 2
    """,
)
def dedup_source_matrix(spark, sf_dir):
    """Cross-source near-duplication matrix: MinHash-LSH candidate pairs
    rolled up by (source, source) — the corpus diagnostic that tells you
    WHICH feeds mirror each other (two crawls of the same host, a dataset
    repackaged under a new name) before you spend the full dedup pass.

    Scale: the pair list is the expensive artifact and it already exists
    (banded equi-join); this adds two id-keyed joins to attach sources —
    at 100 TB the (doc_id -> source) projection is a slim two-column scan,
    and the output is |sources|^2 rows, tiny.  least/greatest canonicalizes
    the unordered pair so A~B and B~A land in one cell."""
    docs = T(spark, sf_dir, "documents")
    sig_vec = D.minhash_signature_vector(docs, "doc_id", "text", num_perm=8, n=3)
    pairs = D.minhash_lsh_candidates_wide(sig_vec, num_perm=8, rows_per_band=2)
    src = docs.select("doc_id", "source")
    labeled = (
        pairs.join(src.select(F.col("doc_id").alias("id1"), F.col("source").alias("s1")), "id1")
        .join(src.select(F.col("doc_id").alias("id2"), F.col("source").alias("s2")), "id2")
    )
    return labeled.groupBy(
        F.least("s1", "s2").alias("source_a"),
        F.greatest("s1", "s2").alias("source_b"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))


@query(
    "dedup_cross_decontaminate",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    {_MINHASH_CTE},
    minh AS (SELECT id, perm, MIN(h) AS minhash FROM hashed GROUP BY 1, 2),
    bands AS (
      SELECT id, perm // 2 AS band,
             md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY perm)) AS band_hash
      FROM minh GROUP BY id, perm // 2
    ),
    hits AS (
      SELECT c.id, CAST(COUNT(DISTINCT r.id) AS BIGINT) AS n_ref_matches
      FROM bands c
      JOIN bands r ON c.band = r.band AND c.band_hash = r.band_hash
      WHERE c.id >= 50 AND r.id < 50
      GROUP BY c.id
    )
    SELECT d.doc_id,
           COALESCE(h.n_ref_matches, 0) AS n_ref_matches,
           CASE WHEN h.id IS NULL THEN 0 ELSE 1 END AS is_hit
    FROM documents d LEFT JOIN hits h ON h.id = d.doc_id
    WHERE d.doc_id >= 50
    """,
)
def dedup_cross_decontaminate(spark, sf_dir):
    """Doc-level decontamination by cross-corpus near-dup: flag every
    training doc (id >= 50) whose MinHash signature LSH-collides with any
    held-out/benchmark doc (id < 50) — the near-duplicate complement of
    `text_contamination`'s shingle-overlap score (a paraphrased benchmark
    leaks past exact shingles but still collides in minhash bands).

    Scale: ONE text scan computes signatures for both sides (filtered
    after signing); reference band rows are BROADCAST (benchmark-sized),
    so the corpus side never shuffles for candidate generation — the only
    data-sized exchange is (id, ref_id) int pairs for actual collisions.
    Reference corpus/eval-set use: the reference engine delegates all
    querying to SQLite (trough/read.py:66) and has no dedup surface; this
    is §2.D extension coverage."""
    docs = T(spark, sf_dir, "documents")
    sig = D.minhash_signature_vector(docs, "doc_id", "text", num_perm=8, n=3)
    corpus = sig.filter(F.col("id") >= 50)
    ref = sig.filter(F.col("id") < 50)
    # Report over the FULL corpus doc list, not the signature table: docs
    # shorter than n tokens have no signature row but must still appear
    # as (id, 0, 0) — matching the oracle's FROM documents LEFT JOIN hits.
    corpus_ids = docs.filter(F.col("doc_id") >= 50).select(F.col("doc_id").alias("id"))
    out = D.cross_corpus_near_dup(
        corpus, ref, num_perm=8, rows_per_band=2, corpus_ids=corpus_ids
    )
    return out.select(F.col("id").alias("doc_id"), "n_ref_matches", "is_hit")
