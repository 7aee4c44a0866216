"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design for 100 TB:
- Exact dedup is one hash-aggregate on a digest column — the digest (md5) is
  computed map-side so the shuffle carries 16 bytes + id per row, not the
  document text.
- Near-dup NEVER does an unbounded cross join.  Candidate pairs come from
  equality joins on compact keys (LSH band signatures, shared shingles with a
  stop-shingle frequency cap), so the pair count is bounded per bucket; the
  expensive exact measure (Jaccard) runs only on candidates.
- All hashes are md5-derived (``portable_hash``) so results are reproducible
  across engines and runs — no JVM-specific hashing in any result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# ---------------------------------------------------------------------------
# portable 60-bit hash: identical in Spark, DuckDB, and Python
#   spark : conv(substr(md5(x), 1, 15), 16, 10)::bigint
#   duckdb: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)
#   python: int(hashlib.md5(x).hexdigest()[:15], 16)
# ---------------------------------------------------------------------------


def portable_hash(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of normalized (lower/trimmed) text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


# NB: guard short docs explicitly — Spark's sequence(1, stop) runs DESCENDING
# when stop < 1 (sequence(1, 0) = [1, 0]), so greatest(.., 0) alone would feed
# slice a start of 0 and blow up on any doc shorter than n tokens.
_SHINGLE_EXPR = (
    "if(size(toks) < {n}, array(), "
    "transform(sequence(1, size(toks) - {nm1}), "
    "i -> concat_ws(' ', slice(toks, i, {n}))))"
)


def shingle_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_doc_freq: int | None = None,
    dedupe: bool = True,
) -> DataFrame:
    """Exploded (id, shingle) pairs, distinct by default.

    ``max_doc_freq`` drops shingles appearing in more than that many docs
    ("stop shingles") — the standard cap that keeps the candidate join from
    exploding on boilerplate at corpus scale.

    ``dedupe=False`` skips the distinct — a whole shuffle of the exploded
    shingle table.  Only valid for duplicate-insensitive consumers (MIN/MAX
    aggregates, e.g. minhash); anything that COUNTS shingles needs the
    distinct, so the doc-frequency cap requires it.
    """
    if not dedupe and max_doc_freq is not None:
        # must survive python -O: with dedupe off the window would count
        # occurrences, not document frequencies, silently changing results
        raise ValueError("max_doc_freq counts need dedupe=True")
    sh = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")).select(
        "id", F.explode(F.expr(_SHINGLE_EXPR.format(n=n, nm1=n - 1))).alias("shingle")
    )
    if dedupe:
        sh = sh.distinct()
    if max_doc_freq is not None:
        # doc-frequency cap as a WINDOW on shingle, not agg+join-back: one
        # exchange by shingle that the downstream candidate self-join then
        # reuses (same subtree -> ReusedExchange, already sorted for SMJ) —
        # two fewer shuffles of the exploded table than the agg+join form
        from pyspark.sql.window import Window

        w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= max_doc_freq)
            .drop("_df")
        )
    return sh


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups by content digest.

    Returns (content_hash, n_copies, keep_id) — keep_id is the smallest id,
    the canonical survivor.  One map-side md5 + one hash aggregate; the
    shuffle carries digests, never document bodies.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("id").alias("keep_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 100,
    prune_by_size: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs sharing at least
    one (non-stop) shingle.

    Scale: the (id, shingle) self-join is an equi-join whose fan-out is capped
    at ``max_doc_freq`` docs per shingle, so candidate pairs per shingle are
    bounded regardless of corpus size.  Jaccard comes from integer
    intersection/size counts — deterministic across engines.
    """
    sh = shingle_table(df, id_col, text_col, n, max_doc_freq)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    if prune_by_size:
        # size-ratio pruning inside the candidate join: jaccard <=
        # min(n1,n2)/max(n1,n2), so pairs with min < threshold*max can never
        # pass — lossless.  Pays off on length-heterogeneous corpora; on
        # uniform-length docs (this synthetic set) it prunes nothing and the
        # extra broadcast attach costs ~45%, hence opt-in.
        src = sh.join(F.broadcast(sizes), "id")
        extra = lambda a, b: (  # noqa: E731
            (F.col("a.n_sh") >= threshold * F.col("b.n_sh"))
            & (F.col("b.n_sh") >= threshold * F.col("a.n_sh"))
        )
    else:
        src = sh
        extra = lambda a, b: F.lit(True)  # noqa: E731
    a, b = src.alias("a"), src.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            & extra(a, b),
        )
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("id").alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("jaccard", F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "n_common", "n1", "n2", F.round("jaccard", 6).alias("jaccard"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Asymmetric n-gram containment: C(A in B) = |sh(A) ∩ sh(B)| / |sh(A)|.

    The inclusion detector symmetric Jaccard misses: a short document fully
    quoted inside a long one (boilerplate, licence headers, syndicated
    articles) has containment 1.0 but Jaccard near |A|/|B| — standard in
    training-data dedup for dropping the contained copy while keeping the
    superset document.

    Each undirected candidate pair is evaluated ONCE and emitted with both
    directed containments; pairs where neither direction clears
    ``threshold`` are dropped.

    Scale: candidate generation is the same doc-frequency-capped (id,
    shingle) equi-join as :func:`ngram_jaccard_pairs` — fan-out per shingle
    bounded by ``max_doc_freq`` regardless of corpus size; the per-pair
    shuffle carries integer counts only.
    """
    sh = shingle_table(df, id_col, text_col, n, max_doc_freq)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.select(F.col("id").alias("id1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("id").alias("id2"), F.col("n_sh").alias("n2"))
    return (
        common.join(s1, "id1")
        .join(s2, "id2")
        .filter(
            (F.col("n_common") / F.col("n1") >= threshold)
            | (F.col("n_common") / F.col("n2") >= threshold)
        )
        .select(
            "id1",
            "id2",
            "n_common",
            "n1",
            "n2",
            F.round(F.col("n_common") / F.col("n1"), 6).alias("contain_1_in_2"),
            F.round(F.col("n_common") / F.col("n2"), 6).alias("contain_2_in_1"),
        )
    )


# universal-hash family over a Mersenne-prime field: perm_j(h) =
# (A_j * h31 + B_j) mod (2^31 - 1), with h31 = base md5 hash folded to 31
# bits.  ONE md5 per shingle (not one per shingle×perm); the A/B constants
# are small enough that a_j * h31 stays under 2^62 — no bigint overflow in
# either engine (DuckDB errors on overflow; Spark wraps — so staying in
# range is a correctness requirement, not a style choice).
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1
MINHASH_A = [1_000_003, 999_983, 888_887, 777_767, 666_667, 555_557, 444_443, 333_337]
MINHASH_B = [12_345, 54_321, 192_837, 918_273, 112_358, 853_211, 272_727, 727_272]


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 8, n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: one row per (id, perm) carrying the min permuted
    hash over the doc's shingle set.

    Scale: ONE md5 per distinct shingle; permutations are cheap modular
    arithmetic applied map-side; the min is a partial aggregate, so the
    shuffle carries num_perm longs per doc — independent of doc length.

    ``shingles``: a prebuilt (id, shingle) table to reuse instead of
    re-tokenizing ``df`` — MIN is duplicate-insensitive, so deduped or not,
    signatures are bit-identical.  Pipelines that also need shingles for
    contamination/Jaccard share ONE tokenize+explode pass of the corpus
    this way (at 100 TB the text scan is the cost; see pipeline_curation).
    """
    assert num_perm <= len(MINHASH_A)
    # dedupe=False: MIN is duplicate-insensitive, so the distinct's full
    # shuffle of the exploded shingle table buys nothing here (signatures
    # are bit-identical either way)
    if shingles is None:
        shingles = shingle_table(df, id_col, text_col, n, dedupe=False)
    sh = shingles.withColumn(
        "h31", portable_hash(F.col("shingle")) % MINHASH_PRIME
    )
    return (
        sh.select(
            "id", "h31", F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm")
        )
        .withColumn(
            "h",
            (
                F.element_at(F.array(*[F.lit(a) for a in MINHASH_A]), F.col("perm") + 1)
                * F.col("h31")
                + F.element_at(F.array(*[F.lit(b) for b in MINHASH_B]), F.col("perm") + 1)
            )
            % MINHASH_PRIME,
        )
        .groupBy("id", "perm")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_candidates(
    signatures: DataFrame, rows_per_band: int = 2, max_bucket_size: int | None = None
) -> DataFrame:
    """LSH banding over ``minhash_signatures`` output: hash each band of
    ``rows_per_band`` consecutive permutations, emit candidate pairs colliding
    in at least one band.

    Scale: this is the 100 TB near-dup path — pair generation is an equi-join
    on (band, band_hash); work is proportional to actual collisions, never to
    the corpus cross product.  Hot buckets (many ids sharing a band hash) are
    the skew to watch: AQE skew-join splitting covers moderate skew, and
    ``max_bucket_size`` caps the adversarial case (a degenerate band value
    shared by millions of docs would otherwise emit O(bucket²) pairs).  The
    cap drops WHOLE buckets above the limit before the self-join, mirroring
    the stop-shingle cap in ``ngram_jaccard_pairs``.

    Recall note: with the cap on, a pair is lost only if EVERY band it
    collides in is over the cap — near-dup pairs in ordinary corpora collide
    in multiple bands, so recall loss is confined to pathological
    near-constant content (which is usually exact-dup territory anyway).
    ``max_bucket_size=None`` (default) is lossless.
    """
    return _banded_pairs(minhash_bands(signatures, rows_per_band), max_bucket_size)


def minhash_bands(signatures: DataFrame, rows_per_band: int = 2) -> DataFrame:
    """(id, perm, minhash) → (id, band, band_hash): hash each band of
    ``rows_per_band`` consecutive permutations.  Shared by the self-join
    LSH path and the cross-corpus subtraction path; one partial-aggregable
    groupBy whose shuffle carries (id, band, minhash) longs only."""
    return (
        signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("perm"), F.col("minhash")))
                        ),
                        lambda s: s.getField("minhash").cast("string"),
                    ),
                )
            ).alias("band_hash")
        )
    )


def _banded_pairs(banded: DataFrame, max_bucket_size: int | None) -> DataFrame:
    """(id, band, band_hash) → distinct colliding id pairs, with the optional
    hot-bucket cap.  Shared tail of the long-form and wide-form LSH paths."""
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        # bucket occupancy via a window on the SAME key as the join — the
        # count reuses the join's hash partitioning, no extra shuffle stage
        w = Window.partitionBy("band", "band_hash")
        banded = (
            banded.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_bucket_n") <= max_bucket_size)
            .drop("_bucket_n")
        )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )


def minhash_signature_vector(
    df: DataFrame, id_col: str, text_col: str, num_perm: int = 8, n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures as ONE row per doc: (id, sig array<bigint>).

    Same values as ``minhash_signatures`` (bit-identical per permutation,
    asserted in tests) in ONE shuffle instead of two stages of work: the
    num_perm permuted hashes are map-side COLUMNS on the (non-distinct)
    shingle table and each permutation's MIN is a partial aggregate of one
    groupBy(id) — vs the long form's num_perm× row explosion feeding
    groupBy(id, perm).  At 100 TB the explode multiplies the corpus-sized
    shingle table 8×, so the column form is the scale shape; the long form
    remains for consumers of the relational layout (verify stage, oracle
    parity)."""
    assert num_perm <= len(MINHASH_A)
    if shingles is None:
        shingles = shingle_table(df, id_col, text_col, n, dedupe=False)
    sh = shingles.withColumn("h31", portable_hash(F.col("shingle")) % MINHASH_PRIME)
    aggs = [
        F.min(
            (F.lit(MINHASH_A[j]) * F.col("h31") + F.lit(MINHASH_B[j])) % MINHASH_PRIME
        ).alias(f"_m{j}")
        for j in range(num_perm)
    ]
    return (
        sh.groupBy("id")
        .agg(*aggs)
        .select("id", F.array(*[F.col(f"_m{j}") for j in range(num_perm)]).alias("sig"))
    )


def minhash_lsh_candidates_wide(
    sig_vec: DataFrame,
    num_perm: int = 8,
    rows_per_band: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs straight from signature VECTORS
    (``minhash_signature_vector`` output): band hashes are map-side md5s
    over sig slices and each doc explodes to num_perm/rows_per_band band
    rows (vs num_perm signature rows + a banding shuffle in the long form).
    End to end (text → pairs) this path is one full shuffle shorter and
    never multiplies the shingle table by num_perm.  Pair semantics and the
    hot-bucket cap are identical (shared ``_banded_pairs`` tail); the band
    hash matches the long form exactly (md5 of comma-joined minhashes in
    permutation order)."""
    return _banded_pairs(
        _bands_from_vector(sig_vec, num_perm, rows_per_band), max_bucket_size
    )


def _bands_from_vector(
    sig_vec: DataFrame, num_perm: int, rows_per_band: int
) -> DataFrame:
    """(id, sig) → (id, band, band_hash), all map-side: each band hash is an
    md5 over a static slice of the signature vector, matching the long
    form's banding aggregate byte for byte."""
    n_bands = num_perm // rows_per_band
    return sig_vec.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[bi * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("_b"),
    ).select("id", F.col("_b.band").alias("band"), F.col("_b.band_hash").alias("band_hash"))


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash over word tokens (portable-hash based).

    Each distinct-token occurrence votes ±1 on each of ``bits`` positions of
    its hash; the fingerprint sets bit b iff the vote sum is positive.
    Near-dups cluster by fingerprint equality or small Hamming distance
    (pairs via banding, as with MinHash).

    Scale (wide form, round 5): all ``bits`` vote sums are map-side COLUMNS
    into ONE partial-aggregated groupBy(id) — the former long form exploded
    every token ``bits``× and shuffled (id, bit) rows twice.  One shuffle
    carrying ``bits`` longs per doc, no row multiplication; the fingerprint
    assembles from the vote columns map-side.  Values are identical (same
    per-bit integer vote sums, same threshold; oracle unchanged).
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .filter(F.length("tok") > 0)
        .withColumn("h", portable_hash(F.col("tok")))
    )
    votes = tok.groupBy("id").agg(
        *[
            F.sum(F.expr(f"(shiftright(h, {b}) & 1) * 2 - 1")).alias(f"_v{b}")
            for b in range(bits)
        ]
    )
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"_v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("id", fingerprint.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs from SimHash fingerprints: band the
    fingerprint into ``bands`` equal bit-slices, equi-join on any identical
    slice, verify with exact Hamming distance <= ``max_hamming``.

    Pigeonhole guarantee: with ``max_hamming < bands``, any qualifying pair
    differs in fewer bits than there are bands, so at least one band is
    identical — candidate generation has FULL recall while comparisons stay
    proportional to band-bucket occupancy (the MinHash-LSH shape, but on one
    64-bit integer per doc instead of a signature vector — the cheapest
    near-dup join there is at corpus scale).

    Returns (id1, id2, hamming).
    """
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    fp = simhash(df, id_col, text_col, bits=bits)
    banded = fp.select(
        "id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, band * {width}) & {(1 << width) - 1}"),
    )
    a = banded.select(
        F.col("band").alias("b1"), F.col("band_val").alias("v1"),
        F.col("id").alias("id1"), F.col("simhash").alias("s1"),
    )
    b = banded.select(
        F.col("band").alias("b2"), F.col("band_val").alias("v2"),
        F.col("id").alias("id2"), F.col("simhash").alias("s2"),
    )
    return (
        a.join(
            b,
            (F.col("b1") == F.col("b2"))
            & (F.col("v1") == F.col("v2"))
            & (F.col("id1") < F.col("id2")),
        )
        .select("id1", "id2", F.expr("bit_count(s1 ^ s2)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def incremental_lsh_candidates(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 8,
    n: int = 3,
    rows_per_band: int = 2,
) -> DataFrame:
    """Incremental near-dup check: candidate pairs between a NEW batch and
    the EXISTING corpus only (never corpus x corpus) — the daily-ingest
    shape, where yesterday's band table is already materialized and today's
    batch only hashes itself and equi-joins in.

    Returns (new_id, corpus_id).  Work scales with the new batch + its
    band collisions; re-banding the historical corpus each day is the thing
    this avoids at 100 TB (persist the banded table, append to it).
    """
    def bands(df):
        # wide signature path: one shuffle per side, band hashes map-side
        sig_vec = minhash_signature_vector(df, id_col, text_col, num_perm=num_perm, n=n)
        return _bands_from_vector(sig_vec, num_perm, rows_per_band)

    nb = bands(new_docs).select(
        F.col("id").alias("new_id"), "band", "band_hash"
    )
    cb = bands(corpus).select(
        F.col("id").alias("corpus_id"), "band", "band_hash"
    )
    return (
        nb.join(cb, ["band", "band_hash"])
        .select("new_id", "corpus_id")
        .distinct()
    )


# Same short-doc guard as _SHINGLE_EXPR (sequence(1, 0) is [1, 0] in Spark).
_HASHED_SPAN_EXPR = (
    "if(size(toks) < {n}, array(), "
    "transform(sequence(1, size(toks) - {nm1}), "
    "i -> cast(conv(substr(md5(concat_ws(' ', slice(toks, i, {n}))), 1, 15), 16, 10) as bigint)))"
)


def duplicated_span_coverage(
    df: DataFrame, id_col: str, text_col: str, n: int = 8, min_doc_freq: int = 2
) -> DataFrame:
    """Per-document duplicated-span coverage: for every document, the count
    and ppm share of token n-gram positions whose n-gram also appears in at
    least ``min_doc_freq`` distinct documents.  This is the shingle-granular
    approximation of exact-substring training-data dedup (Lee et al., 2022):
    docs with high ``dup_ppm`` are boilerplate-heavy or near-copies and get
    dropped/trimmed by the curation pipeline.

    Returns (id, n_spans, dup_spans, dup_ppm), one row per doc with >= 1 span.

    Scale: spans are hashed map-side inside a single ``transform`` (the
    shuffle carries (id, int64) pairs, never span text); span doc-frequency
    is one hash aggregate; the hot-span set is joined back as a left-semi
    equi-join on the 8-byte hash.  No cross join, no driver collect, and the
    per-doc rollup partial-aggregates on id before the final shuffle.
    """
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )
    pos = base.select(
        "id", F.explode(F.expr(_HASHED_SPAN_EXPR.format(n=n, nm1=n - 1))).alias("h")
    )
    totals = base.select(
        "id",
        F.greatest(F.size("toks") - (n - 1), F.lit(0)).cast("bigint").alias("n_spans"),
    ).filter(F.col("n_spans") > 0)
    hot = (
        pos.groupBy("h")
        .agg(F.count_distinct("id").alias("df_"))
        .filter(F.col("df_") >= min_doc_freq)
        .select("h")
    )
    dup = (
        pos.join(hot, "h", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("dup_spans"))
    )
    return totals.join(dup, "id", "left").select(
        "id",
        "n_spans",
        F.coalesce(F.col("dup_spans"), F.lit(0)).cast("bigint").alias("dup_spans"),
        F.round(
            F.coalesce(F.col("dup_spans"), F.lit(0)) * F.lit(1000000.0) / F.col("n_spans")
        )
        .cast("bigint")
        .alias("dup_ppm"),
    )


def fuzzy_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    block: Column | None = None,
) -> DataFrame:
    """Blocked edit-distance candidate pairs: (id_a, id_b, dist) for all
    pairs in the same block whose Levenshtein distance <= ``max_distance``.

    Entity-resolution shape: an all-pairs Levenshtein join is O(N^2) string
    comparisons — never viable at corpus scale.  The standard answer is
    BLOCKING: an equi-join on a cheap key that (almost) all true matches
    share, confining the quadratic to within-block candidates.  The default
    block key is the first whitespace token (documented recall tradeoff —
    matches whose FIRST token was edited are missed; callers pass a stronger
    domain key via ``block`` when they have one, e.g. a phonetic code or a
    sorted-neighborhood window key).

    A length-difference pre-filter (|len(a) - len(b)| <= k, a trivial lower
    bound on edit distance) runs BEFORE the Levenshtein evaluation so the
    expensive O(len^2) dynamic program only touches length-plausible pairs.

    Scale: one shuffle on the block key; within-block pairing is the only
    quadratic and its size is governed by the caller's key choice.  The
    distance evaluation is the built-in JVM levenshtein — no Python path.
    """
    key = block if block is not None else F.split(F.trim(F.lower(F.col(text_col))), r"\s+")[0]
    t = df.select(
        F.col(id_col).alias("id"),
        F.lower(F.trim(F.col(text_col))).alias("name"),
        key.alias("blk"),
        F.length(F.lower(F.trim(F.col(text_col)))).alias("ln"),
    )
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= max_distance),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
        )
        .filter(F.col("dist") <= max_distance)
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, candidates: DataFrame, num_perm: int = 8
) -> DataFrame:
    """Estimated Jaccard for candidate pairs from signatures alone:
    fraction of permutations whose minhash agrees (the unbiased MinHash
    estimator).  This is the VERIFY stage of the LSH pipeline at corpus
    scale — candidates are checked against num_perm longs per doc, never
    the raw text, so verification cost is independent of document length.

    ``candidates`` is (id1, id2) (e.g. ``minhash_lsh_candidates`` output).
    Returns (id1, id2, n_agree, est_jaccard).  Exact integer agreement
    counts; the estimate is the one float, derived once at the end.
    """
    s1 = signatures.select(
        F.col("id").alias("id1"), F.col("perm"), F.col("minhash").alias("m1")
    )
    s2 = signatures.select(
        F.col("id").alias("id2"), F.col("perm"), F.col("minhash").alias("m2")
    )
    return (
        candidates.join(s1, "id1")
        .join(s2, ["id2", "perm"])
        .groupBy("id1", "id2")
        .agg(F.sum(F.when(F.col("m1") == F.col("m2"), 1).otherwise(0)).alias("n_agree"))
        .select(
            "id1",
            "id2",
            "n_agree",
            F.round(F.col("n_agree") / F.lit(float(num_perm)), 6).alias("est_jaccard"),
        )
    )


def minhash_jaccard_estimate_wide(
    sig_vec: DataFrame, candidates: DataFrame, num_perm: int = 8
) -> DataFrame:
    """``minhash_jaccard_estimate`` from signature VECTORS: candidates join
    ONE row per doc side (vs num_perm rows in the long form) and the
    agreement count is an in-row array fold — so one pipeline (signature
    vectors) feeds banding, candidate generation, AND verification without
    ever exploding to the relational layout.  Output and values identical
    to the long form (asserted in tests)."""
    s1 = sig_vec.select(F.col("id").alias("id1"), F.col("sig").alias("sig1"))
    s2 = sig_vec.select(F.col("id").alias("id2"), F.col("sig").alias("sig2"))
    n_agree = F.aggregate(
        F.zip_with("sig1", "sig2", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("bigint")
    return (
        candidates.join(s1, "id1")
        .join(s2, "id2")
        .select(
            "id1",
            "id2",
            n_agree.alias("n_agree"),
            F.round(n_agree / F.lit(float(num_perm)), 6).alias("est_jaccard"),
        )
    )


def chunk_dedup_rewrite(
    df: DataFrame, id_col: str, text_col: str, chunk: int = 20
) -> DataFrame:
    """Corpus-wide exact-chunk dedup WITH rewrite (the remove side of
    exact-substring training-data dedup, Lee et al. 2022): split every
    document into fixed-size token chunks, keep only the corpus-wide FIRST
    occurrence of each distinct chunk (lexicographic min (id, idx)), and
    re-emit each document with its duplicated chunks removed.

    Complements ``duplicated_span_coverage`` (which only MEASURES overlap):
    this operator produces the deduplicated corpus a training pipeline
    actually ships.  The reference has no such operator (its relational
    surface is SQLite pass-through, trough/read.py:66); this is a §2.D
    training-pipeline extension.

    Returns (id, n_chunks, kept_chunks, kept_ppm, kept_hash) where
    ``kept_hash`` is md5 of the rewritten text — a compact, hashable stand-in
    for the rewritten corpus (the full text path is the same plan minus the
    final md5).  Documents whose every chunk loses (full duplicates of an
    earlier doc) are dropped from the output — they have no rewritten text.

    Scale: chunk text is hashed map-side and immediately dropped — the
    winner aggregate and the membership join shuffle only (id, idx, 16-byte
    md5) triples, and the kept-index rollup shuffles bare ints.  The
    rewritten text is RE-SLICED from the document row after an id-keyed
    join, so no shuffle ever carries document bodies.  Winner selection is a
    partial-aggregating MIN over a 12-byte struct; every join is an
    equi-join (hash or id), no cross product.
    """
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )
    # (id, idx, h): md5 of the idx-th chunk, computed map-side
    chunks = base.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(toks) / {chunk}.0) as int) - 1), "
                f"i -> md5(concat_ws(' ', slice(toks, i * {chunk} + 1, {chunk}))))"
            )
        ).alias("idx", "h"),
    )
    winners = chunks.groupBy("h").agg(
        F.min(F.struct("id", "idx")).alias("w")
    )
    kept_idx = (
        chunks.join(winners, "h")
        .filter((F.col("id") == F.col("w.id")) & (F.col("idx") == F.col("w.idx")))
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("idx")).alias("kept"))
    )
    return (
        base.select("id", "toks", F.expr(f"cast(ceil(size(toks) / {chunk}.0) as bigint)").alias("n_chunks"))
        .join(kept_idx, "id")
        .select(
            "id",
            "n_chunks",
            F.size("kept").cast("bigint").alias("kept_chunks"),
            F.round(F.size("kept") * F.lit(1000000.0) / F.col("n_chunks"))
            .cast("bigint")
            .alias("kept_ppm"),
            F.md5(
                F.expr(
                    f"concat_ws(' ', transform(kept, i -> concat_ws(' ', slice(toks, i * {chunk} + 1, {chunk}))))"
                )
            ).alias("kept_hash"),
        )
    )


def cross_corpus_near_dup(
    corpus_sig_vec: DataFrame,
    reference_sig_vec: DataFrame,
    num_perm: int = 8,
    rows_per_band: int = 2,
    broadcast_reference: bool = True,
    corpus_ids: DataFrame | None = None,
) -> DataFrame:
    """Cross-corpus near-dup subtraction: flag every CORPUS doc whose
    MinHash signature collides (in >= 1 LSH band) with ANY REFERENCE doc —
    the doc-level decontamination step that removes training documents
    near-duplicating a benchmark/eval set (vs. `text.contamination`, which
    scores shingle overlap, and the self-join LSH paths, which pair a
    corpus with itself).

    Inputs are ``minhash_signature_vector`` outputs so one text scan can
    feed both sides (compute signatures over the union, then filter — see
    pipeline_cross_decontaminate).  Returns one row per corpus doc:
    (id, n_ref_matches, is_hit) with is_hit = 1 iff any reference collision.

    Scale: band hashes are map-side on both sides; with
    ``broadcast_reference=True`` (the normal case — reference sets are
    benchmark-sized, millions of band rows at most) the band join is a
    BROADCAST hash join, so the 100 TB corpus side never shuffles for
    candidate generation.  The only data-sized shuffle is the
    count-distinct groupBy carrying (id, ref_id) pairs for actual
    collisions.  A corpus-sized reference degrades gracefully: drop the
    broadcast flag and the join becomes a sort-merge on the compact
    (band, band_hash) key, same shape as the self-join path.

    ``corpus_ids`` (optional, one ``id`` column): the FULL corpus doc-id
    spine to report over.  ``minhash_signature_vector`` emits no row for
    docs with fewer than n tokens (the empty shingle array is dropped by
    explode), so a spine built from the signature table silently omits
    short docs from the decontamination report.  Passing the corpus doc
    list here emits (id, 0, 0) for signature-less docs — a short doc is
    by construction not a near-dup of anything, but it must still appear
    in the report (and match the oracle's FROM documents row set).
    """
    bands_c = _bands_from_vector(corpus_sig_vec, num_perm, rows_per_band)
    bands_r = _bands_from_vector(reference_sig_vec, num_perm, rows_per_band)
    if broadcast_reference:
        bands_r = F.broadcast(bands_r)
    hits = (
        bands_c.alias("c")
        .join(
            bands_r.alias("r"),
            (F.col("c.band") == F.col("r.band"))
            & (F.col("c.band_hash") == F.col("r.band_hash")),
        )
        .groupBy(F.col("c.id").alias("id"))
        .agg(F.count_distinct(F.col("r.id")).alias("n_ref_matches"))
    )
    spine = corpus_ids.select("id") if corpus_ids is not None else corpus_sig_vec.select("id")
    return (
        spine
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_ref_matches"), F.lit(0)).alias("n_ref_matches"),
            F.when(F.col("n_ref_matches").isNotNull(), 1).otherwise(0).alias("is_hit"),
        )
    )
