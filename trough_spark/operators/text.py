"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure built-in expressions (split/regexp/aggregate) — whole-stage
codegen'd, zero Python in the row path, embarrassingly parallel at any scale
(no shuffles except the caller's aggregations).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

# deterministic little marker lists for the language-ID heuristic; real
# pipelines swap in proper n-gram tables — the *shape* (map-side scoring,
# argmax via greatest/CASE) is what scales.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "los", "que", "de"],
    "zh": ["的", "是", "了", "在", "我"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def marker_hits(text: Column, markers: list[str]) -> Column:
    """How many tokens of ``text`` are in ``markers`` (array intersection on
    the tokenized text — map-side only)."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    lit_markers = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_markers, t)))


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features: lengths, token stats, punctuation and
    stopword ratios, plus a coarse quality bucket.

    The ratio thresholds mirror common pretraining-data filters (C4/Gopher
    style: too-short docs, low alpha ratio, stopword-free docs are junk).
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    n_toks = token_count(text)
    alpha_chars = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    # punct count = total chars minus chars left after deleting punctuation
    punct_chars = n_chars - F.length(F.regexp_replace(text, r"[!-/:-@\[-`{-~]", ""))
    stop_hits = marker_hits(text, LANG_MARKERS["en"])
    avg_tok_len = F.when(n_toks > 0, (F.length(F.regexp_replace(text, r"\s+", "")) / n_toks))
    quality = (
        F.when(n_toks < 5, "too_short")
        .when(alpha_chars / F.greatest(n_chars, F.lit(1)) < 0.6, "low_alpha")
        .when(stop_hits == 0, "no_stopwords")
        .otherwise("ok")
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        alpha_chars.alias("n_alpha"),
        punct_chars.alias("n_punct"),
        stop_hits.alias("n_stopwords"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        quality.alias("quality_bucket"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: score each candidate language by marker-token
    hits, predict the argmax.

    Argmax is encoded portably as ``greatest`` over zero-padded
    ``score||lang`` strings — highest score wins, ties resolve to the
    lexicographically largest lang; identical semantics in any SQL engine
    (the oracle mirrors it verbatim)."""
    text = F.col(text_col)
    tagged = [
        F.concat(F.lpad(marker_hits(text, words).cast("string"), 6, "0"), F.lit(lang))
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*tagged)
    return df.select(
        F.col(id_col).alias("id"),
        F.substring(best, 7, 10).alias("predicted_lang"),
        F.substring(best, 1, 6).cast("bigint").alias("marker_score"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic document fingerprint: md5 of case-folded,
    whitespace-collapsed, punctuation-stripped text — the exact-dedup key
    robust to trivial formatting differences."""
    normalized = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""), r"\s+", " ")
    )
    return df.select(F.col(id_col).alias("id"), F.md5(normalized).alias("fingerprint"))


def tf_idf(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-(document, term) TF-IDF over whitespace tokens.

    tf = term count / doc token count; idf = ln(N / doc_freq).
    Scale: one explode + two partial-aggregates (term counts per doc, doc
    freq per term).  The idf join on ``term`` carries NO broadcast hint —
    vocabulary is unbounded at corpus scale, so AQE/threshold decides.
    N is folded in as a one-row aggregate via cross join (a broadcast
    nested-loop of exactly one row), keeping the whole operator a single
    lazy job with no eager driver action.  The score is rounded to 6
    decimals at the boundary.
    """
    tok = (
        df.select(F.col(id_col).alias("id"), F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"))
        .filter(F.length("term") > 0)
    )
    term_counts = tok.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tc"))
    # doc length = sum of the doc's term counts — derived from term_counts
    # instead of a second groupBy over ``tok``, which re-scanned and
    # re-exploded the whole corpus (optimization round 11; the plan had
    # two identical Scan+Generate subtrees, and at 100 TB the extra
    # tokenize pass is a full corpus read).  Integer-identical by
    # definition: count(tokens per doc) == sum(per-term counts per doc).
    doc_lens = term_counts.groupBy("id").agg(F.sum("tc").alias("dl"))
    doc_freq = term_counts.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
    n_docs = (
        df.select(F.col(id_col).alias("id"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("n_docs_"))
    )
    return (
        term_counts.join(doc_lens, "id")
        .join(doc_freq, "term")
        .crossJoin(n_docs)
        .select(
            "id",
            "term",
            F.col("tc").alias("term_count"),
            F.round(
                (F.col("tc") / F.col("dl")) * F.log(F.col("n_docs_") / F.col("df_")),
                6,
            ).alias("tfidf"),
        )
    )


# GPT-2-style pretokenizer shape: contraction suffixes, space-prefixed word /
# number / punctuation runs.  Compatible between Java regex and DuckDB's RE2.
BPE_ISH_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-style pretokenization (regex runs, not whitespace) — the token
    accounting used by training-data pipelines.  Pure regexp_extract_all,
    map-side only."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(bpe_ish_tokens(text))


# ---------------------------------------------------------------------------
# Corpus-statistics quality signals: boilerplate, contamination, unigram LM
# ---------------------------------------------------------------------------
def boilerplate_ratio(
    df,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_pct: int | None = None,
    min_docs: int | None = None,
):
    """Per-document boilerplate share: the fraction of a doc's distinct
    n-gram shingles that recur across the corpus (CCNet-style
    repeated-content detection at n-gram granularity).  A shingle is
    boilerplate when its doc frequency reaches ``min_docs`` documents
    (absolute), or ``max_pct`` percent of the corpus (relative) — exactly
    one must be given.  Returns (id, n_shingles, n_boiler,
    boilerplate_ratio).

    Scale: shingle doc-frequency is one partial-aggregated groupBy on the
    shingle key; the corpus size (relative mode) folds in via a one-row
    broadcast cross join — no eager driver action.  All decisions are
    integer compares; only the final ratio is a rounded double."""
    from trough_spark.operators.dedup import shingle_table

    if (max_pct is None) == (min_docs is None):
        raise ValueError("give exactly one of max_pct / min_docs")
    sh = shingle_table(df, id_col, text_col, n=n)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_cnt"))
    if min_docs is not None:
        freq = freq.select(
            "shingle", (F.col("df_cnt") >= F.lit(min_docs)).alias("is_boiler")
        )
    else:
        n_docs = df.select(F.countDistinct(F.col(id_col)).alias("_nd"))
        freq = freq.crossJoin(F.broadcast(n_docs)).select(
            "shingle",
            (F.col("df_cnt") * 100 >= F.lit(max_pct) * F.col("_nd")).alias("is_boiler"),
        )
    per_doc = (
        sh.join(freq, "shingle")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).alias("n_boiler"),
        )
    )
    return per_doc.select(
        "id",
        "n_shingles",
        F.col("n_boiler").cast("bigint").alias("n_boiler"),
        F.round(F.col("n_boiler") / F.col("n_shingles"), 4).alias("boilerplate_ratio"),
    )


def contamination(
    corpus, benchmark, id_col: str, text_col: str, n: int = 3,
    corpus_shingles=None, benchmark_shingles=None,
):
    """Benchmark-contamination score per corpus document: the fraction of
    the doc's distinct n-gram shingles that also occur anywhere in the
    ``benchmark`` set — the standard pre-training leak check run before a
    corpus ships.  Returns (id, n_shingles, n_overlap, contamination).

    Scale: the benchmark shingle set is distinct-reduced and usually small
    (benchmarks are), so the membership probe is a broadcast-able semi
    join on the shingle key; corpus-side work is one shingle explode +
    one groupBy per doc.

    ``corpus_shingles``/``benchmark_shingles``: prebuilt PER-DOC-DISTINCT
    (id, shingle) tables to reuse instead of re-tokenizing — lets a
    pipeline share one shingle pass across dedup + contamination stages."""
    from trough_spark.operators.dedup import shingle_table

    doc_sh = (
        corpus_shingles
        if corpus_shingles is not None
        else shingle_table(corpus, id_col, text_col, n=n)
    )
    bench_sh = (
        benchmark_shingles
        if benchmark_shingles is not None
        else shingle_table(benchmark, id_col, text_col, n=n)
    ).select("shingle").distinct()
    hits = doc_sh.join(bench_sh, "shingle", "left_semi").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    per_doc = doc_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        per_doc.join(hits, "id", "left")
        .select(
            "id",
            "n_shingles",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce(F.col("n_overlap"), F.lit(0)) / F.col("n_shingles"), 4
            ).alias("contamination"),
        )
    )


def unigram_logprob(df, id_col: str, text_col: str):
    """Per-document mean unigram log10-probability under the corpus's own
    unigram distribution — the classic cheap LM quality score (gibberish
    and off-distribution docs score low).  Returns (id, n_tokens,
    mean_logprob).

    Determinism: each token's log-probability is quantized to an integer
    (round(log10(cnt/total) * 1e6) — verified bit-equal between Spark and
    DuckDB across the full count range), so the per-doc aggregate is an
    exact BIGINT sum that no float-accumulation order can perturb; one
    double division at the end, rounded to 4.

    Scale: two shuffles (corpus term counts, per-doc term counts), both
    partial-aggregated; corpus total folds in as a one-row broadcast."""
    from trough_spark.operators.dedup import tokens

    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).where(F.col("tok") != "")
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.select(F.count(F.lit(1)).alias("_total"))
    qlog = cnt.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(
            F.log10(F.col("cnt").cast("double") / F.col("_total")) * 1000000, 0
        ).cast("bigint").alias("qlog"),
    )
    return (
        tf.join(qlog, "tok")
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("qlog")).alias("_s"),
        )
        .select(
            "id",
            "n_tokens",
            F.round(
                F.col("_s").cast("double") / F.col("n_tokens") / 1000000.0, 4
            ).alias("mean_logprob"),
        )
    )


def repetition_ratio(df, id_col: str, text_col: str, n: int = 3):
    """Within-document repetition (Gopher-style repetition filter): the
    fraction of a doc's n-gram occurrences that are repeats of an n-gram
    already seen in the SAME doc — high values mean looping/templated text.
    Returns (id, n_grams, n_distinct, repetition_ratio).  Pure map +
    per-doc aggregation; integer counts, one rounded double."""
    from trough_spark.operators.dedup import tokens

    toks = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )
    grams = toks.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(toks) - {n - 1}, 0)), "
                f"i -> concat_ws(' ', slice(toks, i, {n})))"
            )
        ).alias("g"),
    )
    per = grams.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count_distinct(F.col("g")).alias("n_distinct"),
    )
    return per.select(
        "id",
        "n_grams",
        "n_distinct",
        F.round(
            (F.col("n_grams") - F.col("n_distinct")) / F.col("n_grams"), 4
        ).alias("repetition_ratio"),
    )


def source_quality_rollup(
    df, id_col: str, text_col: str, source_col: str, min_ok_pct: int = 70
):
    """Domain/source-level quality decision: aggregate per-document quality
    buckets up to the source and flag sources whose 'ok' share falls under
    ``min_ok_pct`` percent — how pipelines derive domain blocklists from
    document-level signals.  Integer compares decide; returns
    (source, n_docs, n_ok, ok_pct, verdict)."""
    feats = quality_features(df, id_col, text_col).select(
        F.col("id"), F.col("quality_bucket")
    )
    src = df.select(F.col(id_col).alias("id"), F.col(source_col).alias("source"))
    per = (
        src.join(feats, "id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("quality_bucket") == "ok", 1).otherwise(0)
            ).cast("bigint").alias("n_ok"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "n_ok",
        F.round(F.col("n_ok") / F.col("n_docs"), 4).alias("ok_pct"),
        F.when(
            F.col("n_ok") * 100 >= F.lit(min_ok_pct) * F.col("n_docs"), "keep"
        ).otherwise("block").alias("verdict"),
    )


# ---------------------------------------------------------------------------
# PII scrubbing and token-window chunking — training-data prep primitives
# ---------------------------------------------------------------------------
PII_PATTERNS = {
    # Kept to the regex subset Java (Spark) and RE2 (DuckDB) match
    # identically: literal classes, bounded repeats, \d — no backrefs or
    # lookaround, so both engines find the same spans.
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\d{3}-\d{3}-\d{4}",
    "ip": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
}
# Scrub order matters (an email can contain digits; an IP can look like the
# tail of a phone) — fixed here and mirrored in the oracle SQL.
PII_ORDER = ("email", "phone", "ip")


def pii_scrub(df, id_col: str, text_col: str):
    """Count and redact PII spans: (id, n_email, n_phone, n_ip, clean_text).
    Pure map — regexp_extract_all for counts, chained regexp_replace for
    redaction; at 100 TB this runs in the scan stage with zero shuffle.
    Counts are taken BEFORE any replacement so overlapping categories don't
    eat each other's matches."""
    text = F.col(text_col)
    counts = {
        k: F.size(F.regexp_extract_all(text, F.lit(p), F.lit(0))).alias(f"n_{k}")
        for k, p in PII_PATTERNS.items()
    }
    clean = text
    for k in PII_ORDER:
        clean = F.regexp_replace(clean, PII_PATTERNS[k], f"<{k.upper()}>")
    return df.select(
        F.col(id_col).alias("id"),
        *[counts[k] for k in PII_ORDER],
        clean.alias("clean_text"),
    )


def chunk_tokens(df, id_col: str, text_col: str, window: int = 32, stride: int = 24):
    """Split each document into token windows of ``window`` tokens with
    ``stride`` between starts (overlap = window - stride), the standard
    long-document prep for a fixed-context trainer.  Output is one row per
    chunk: (id, chunk_idx, n_tokens, chunk_text).

    Pure map + posexplode — no shuffle; chunk count per doc is
    ceil(max(n - window, 0) / stride) + 1, computed in exact integer
    arithmetic so the DuckDB oracle reproduces the fan-out bit-for-bit."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # floor((n - window + stride - 1) / stride) + 1; the double division is
    # exact for these magnitudes so floor() == integer division in both
    # engines (DuckDB's // on the oracle side).
    extra = (n - window + stride - 1).cast("double")
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.floor(extra / stride).cast("int") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, window)),
    )
    out = df.select(
        F.col(id_col).alias("id"),
        n.alias("_n"),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    )
    n_tok = F.least(F.lit(window), F.col("_n") - F.col("chunk_idx") * stride)
    return out.select(
        "id",
        "chunk_idx",
        n_tok.cast("bigint").alias("n_tokens"),
        "chunk_text",
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """BM25 keyword search: top-``k`` documents for a bag of query ``terms``
    (Robertson/Sparck Jones weighting, Lucene-style idf).

    Returns (id, n_terms_hit, score_micro) — the score is quantized to
    integer micro-units PER TERM before summing, so the aggregate is an
    integer sum (order-proof and bit-identical across engines); ties at the
    cutoff break by id.

    Scale: the corpus is scanned once; tokens are filtered to the query
    vocabulary map-side, so the shuffled tf table is O(docs × |terms|), not
    O(tokens).  Document-frequency and the (N, avgdl) scalars are one-row /
    |terms|-row broadcasts; the final top-k is a TakeOrderedAndProject, not
    a global sort.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("toks"),
    )
    lens = base.select("id", F.size("toks").alias("dl"))
    tf = (
        base.select("id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(list(terms)))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df_") + F.lit(0.5)) / (F.col("df_") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl)
    )
    contrib = F.round(idf * tfn * F.lit(1000000.0)).cast("bigint")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "id")
        .crossJoin(F.broadcast(stats))
        .select("id", contrib.alias("c"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
            F.sum("c").alias("score_micro"),
        )
    )
    return scored.orderBy(F.col("score_micro").desc(), "id").limit(k)


def hashed_classifier(
    df,
    id_col: str,
    text_col: str,
    n_buckets: int = 1 << 18,
    weight_range: int = 1_000_000,
):
    """In-plan linear text classifier (the fastText/quality-classifier
    inference shape used to score web corpora): tokens hash into
    ``n_buckets`` feature buckets, each bucket carries a fixed weight, and a
    document's score is the mean bucket weight over its tokens.

    The weight table is *implicit* — weight(b) = (b * 2654435761) mod
    (2*R+1) - R, a Knuth multiplicative mix mapping each bucket to a
    deterministic integer in [-R, R].  Real deployments broadcast trained
    weights instead; the arithmetic shape (hash -> weight -> mean -> sign)
    and the plan are identical, and the implicit table keeps the operator
    oracle-checkable with zero side inputs.

    Scale: inference is a PURE MAP — tokenize, transform tokens to weights,
    aggregate the sum with higher-order functions, all inside one projection
    with no explode, no shuffle, no Python.  Per-doc cost is O(tokens);
    100 TB of documents parallelizes perfectly.  Integer sums only; the one
    division is quantized (micro-units) before the sign decision, so ranking
    and labels are bit-stable across engines.

    Returns (id, n_tokens, margin_micro, label): margin_micro = round(
    sum(w)/n * 1e6 / R) — the mean weight in micro-units of R — and label =
    'keep' iff margin_micro > 0 ('drop' otherwise, including empty docs).
    """
    mod = 2 * weight_range + 1
    # per-token weight, entirely in SQL expression land (runs per array slot)
    # the conv() result MUST be cast to bigint before any arithmetic:
    # conv returns a STRING, and string-vs-int math promotes to DOUBLE,
    # which silently rounds the 60-bit hash (exact only to 2^53) and
    # assigns some tokens to the wrong bucket
    w_expr = (
        f"aggregate(filter(split(trim(lower({text_col})), '\\\\s+'), t -> t != ''), "
        f"cast(0 as bigint), (acc, t) -> acc + "
        f"((cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint) % {n_buckets}) "
        f"* 2654435761 % {mod} - {weight_range}))"
    )
    n_expr = f"size(filter(split(trim(lower({text_col})), '\\\\s+'), t -> t != ''))"
    out = df.select(
        F.col(id_col).alias("id"),
        F.expr(n_expr).cast("bigint").alias("n_tokens"),
        F.expr(w_expr).alias("_sum"),
    ).select(
        "id",
        "n_tokens",
        F.when(F.col("n_tokens") > 0,
               F.round(F.col("_sum") / F.col("n_tokens") / weight_range * 1_000_000, 0)
               .cast("bigint")
        ).otherwise(F.lit(0).cast("bigint")).alias("margin_micro"),
    ).select(
        "id",
        "n_tokens",
        "margin_micro",
        F.when(F.col("margin_micro") > 0, "keep").otherwise("drop").alias("label"),
    )
    return out


def surt_canonicalize(df: DataFrame, url_col: str) -> DataFrame:
    """URL canonicalization to SURT (Sort-friendly URI Reordering Transform)
    form — the web-archive key format (host labels reversed so one domain's
    captures sort together; reference context: trough stores crawl data).

    Canonicalization steps, all JVM-side expressions:
    - scheme dropped, host lowercased, leading ``www.`` stripped;
    - tracking query params (``utm_*``, ``fbclid``, ``gclid``) removed;
    - surviving query params sorted (SURT requires a canonical param order);
    - SURT key = reversed host labels joined by ',' + ')' + path [+ '?' + qs].

    Scale: pure per-row expressions — no shuffle, no UDF; the SURT key is
    exactly what you'd range-partition 100 TB of captures by (per-domain
    locality) before any host-level aggregate.

    Output: (url, host, surt).
    """
    url = F.col(url_col)
    host_raw = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    host = F.regexp_replace(host_raw, r"^www\.", "")
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs_raw = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qs_raw, "&"),
        lambda p: ~(
            p.startswith("utm_") | p.startswith("fbclid=") | p.startswith("gclid=") | (p == "")
        ),
    )
    qs = F.array_join(F.array_sort(params), "&")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    surt = F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return df.withColumn("host", host).withColumn("surt", surt)


def html_strip(col: Column) -> Column:
    """Strip HTML down to text: drop script/style blocks and comments, then
    tags, decode the common entities, and collapse whitespace runs — the
    first transform every web-crawl pipeline applies before any quality or
    dedup stage.

    Pure native regexp chain (map-only, zero shuffle, whole-stage codegen).
    Patterns deliberately avoid backreferences so the SAME expressions run
    under Java regex (Spark) and RE2 (DuckDB oracle) with identical
    semantics.  This is the fast-path 95% strip; a DOM-accurate extractor
    (trafilatura-class) would slot in as a mapInPandas kernel like the
    multimodal codecs."""
    s = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, r"<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", "\""),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last, so "&amp;lt;" decodes to the literal "&lt;"
    ):
        s = F.regexp_replace(s, ent, ch)
    # explicit class, not \s: Java regex counts \x0B as whitespace, RE2
    # does not — the explicit class behaves identically in both engines
    return F.trim(F.regexp_replace(s, r"[ \t\r\n\f]+", " "))


def hashed_embedding(
    df: DataFrame, id_col: str, text_col: str, dims: int = 64
) -> DataFrame:
    """Feature-hashing ("hashing trick", Weinberger et al. 2009) document
    embedding: every token is routed to dimension ``portable_hash(tok) %
    dims`` with sign taken from the next hash bit, and the per-dimension
    signed counts form a sparse integer vector.  The cheapest text->vector
    bridge there is — no vocabulary, no model, integer-exact (so
    cross-engine hash-checkable), and unbiased as an inner-product sketch.

    Returns the sparse long form (id, dim, weight), nonzero entries only —
    the natural input for the cosine/ANN operators after normalization.

    Scale: explode + one partial-aggregating groupBy on (id, dim); the
    shuffle carries (id, int, int) triples, never tokens.
    """
    from trough_spark.operators.dedup import portable_hash, tokens

    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    h = portable_hash(F.col("tok"))
    return (
        tok.select(
            "id",
            (h % dims).cast("int").alias("dim"),
            # sign bit taken high above the bucket bits, so it is
            # independent of dim for any dims < 2^32
            F.when(F.shiftright(h, 32) % 2 == 1, 1).otherwise(-1).alias("sgn"),
        )
        .groupBy("id", "dim")
        .agg(F.sum("sgn").cast("bigint").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def hashed_cosine_topk(
    emb: DataFrame, query_id: int, k: int = 20
) -> DataFrame:
    """Top-k documents most similar to ``query_id`` by cosine over sparse
    hashed embeddings (``hashed_embedding`` long-form output) — nearest
    neighbors from raw text alone, no embedding model anywhere.

    The dot product is a sparse equi-join on dim against the BROADCAST
    query vector (<= dims rows by construction), norms are one partial
    aggregate, and the ranking is TakeOrdered top-k.  cosine = dot /
    sqrt(|q|^2 * |d|^2) uses only IEEE-correctly-rounded ops (sqrt,
    divide) over exact integers, so the micro-rounded score is
    cross-engine deterministic.

    Returns (id, dot, norm2, cos_micro) ordered by similarity.
    """
    qv = emb.filter(F.col("id") == query_id).select(
        "dim", F.col("weight").alias("qw")
    )
    norms = emb.groupBy("id").agg(
        F.sum(F.col("weight") * F.col("weight")).alias("norm2")
    )
    qnorm = F.broadcast(
        norms.filter(F.col("id") == query_id).select(
            F.col("norm2").alias("qnorm2")
        )
    )
    dots = (
        emb.filter(F.col("id") != query_id)
        .join(F.broadcast(qv), "dim")
        .groupBy("id")
        .agg(F.sum(F.col("weight") * F.col("qw")).alias("dot"))
    )
    return (
        dots.join(norms, "id")
        .crossJoin(qnorm)
        .select(
            "id",
            "dot",
            "norm2",
            F.round(
                F.col("dot")
                / F.sqrt((F.col("norm2") * F.col("qnorm2")).cast("double"))
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("cos_micro"),
        )
        .orderBy(F.desc("cos_micro"), F.asc("id"))
        .limit(k)
    )


def rrf_fuse(
    ranked: list[tuple[DataFrame, str]],
    k0: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of candidate
    lists from heterogeneous retrievers — the standard hybrid-search
    combiner (keyword BM25 + vector ANN) for RAG-style retrieval.

    Each input is ``(df, score_col)`` with an ``id`` column; ranks are
    assigned by (score desc, id asc) and each list contributes
    ``round(1e9 / (k0 + rank))`` integer micro-units, so the fused score
    is an integer sum — cross-engine deterministic (same IEEE
    double-divide-then-round pattern as ``hashed_cosine_topk``).

    Scale: inputs are top-k candidate lists, ALREADY bounded by the
    retrievers that produced them (BM25 / ANN do the corpus-sized work);
    fusion is O(sum of list sizes), so the un-partitioned rank windows
    here run over k-row inputs, never the corpus.

    Returns (id, rrf_micro, <score_col>_rank per input list — NULL when
    the id is absent from that list), ordered by fused score.
    """
    from functools import reduce

    parts = []
    for j, (df, score_col) in enumerate(ranked):
        w = Window.orderBy(F.desc(score_col), F.asc("id"))
        parts.append(
            df.select(
                "id", F.row_number().over(w).cast("long").alias("r")
            ).select(
                "id",
                "r",
                F.round(
                    F.lit(1e9) / (F.lit(float(k0)) + F.col("r").cast("double"))
                )
                .cast("bigint")
                .alias("c"),
                F.lit(j).alias("src"),
            )
        )
    u = reduce(DataFrame.unionByName, parts)
    aggs = [F.sum("c").alias("rrf_micro")] + [
        F.max(F.when(F.col("src") == j, F.col("r"))).alias(f"{sc}_rank")
        for j, (_df, sc) in enumerate(ranked)
    ]
    return (
        u.groupBy("id")
        .agg(*aggs)
        .orderBy(F.desc("rrf_micro"), F.asc("id"))
        .limit(k)
    )


def gopher_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher-style composite quality-rule flags (Rae et al. 2021 §A1.1,
    re-expressed as pure integer arithmetic so every flag is hash-stable
    across engines — no float ratio ever feeds a comparison):

    - ``rule_word_count``: ``min_words <= n_words <= max_words``
    - ``rule_mean_word_len``: mean word length in [3, 10], tested as
      ``3*n_words <= n_nonspace <= 10*n_words``
    - ``rule_symbol_ratio``: (# '#' chars + # '...'/'…' runs) <= 0.1 words,
      tested as ``10*symbols <= n_words``
    - ``rule_alpha_words``: >= 80% of words contain an alphabetic char,
      tested as ``5*n_alpha_words >= 4*n_words``
    - ``rule_bullets``: <= 90% of lines start with a bullet
      (``-``, ``*``, ``•``)
    - ``rule_ellipsis_lines``: <= 30% of lines end with an ellipsis
    - ``rule_stopwords``: >= 2 distinct common-English stop words present

    ``pass_gopher`` is the conjunction.  Pure map over each row — no
    shuffle, scales embarrassingly; at 100 TB this is the canonical
    pre-dedup filter pass fused into the scan.

    The reference has no text-quality surface (SQLite delegation,
    /root/reference/trough/read.py:66); extension operator per SURVEY §2.D.
    """
    text = F.col(text_col)
    words = F.split(F.trim(text), r"\s+")
    empty = F.length(F.trim(text)) == 0
    n_words = F.when(empty, 0).otherwise(F.size(words)).cast("int")
    n_nonspace = F.length(F.regexp_replace(text, r"\s+", "")).cast("int")
    hashes = (F.length(text) - F.length(F.replace(text, F.lit("#")))).cast("int")
    ell3 = F.floor(
        (F.length(text) - F.length(F.replace(text, F.lit("...")))) / 3
    ).cast("int")
    ellu = (F.length(text) - F.length(F.replace(text, F.lit("…")))).cast("int")
    symbols = hashes + ell3 + ellu
    n_alpha_words = F.when(empty, 0).otherwise(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    ).cast("int")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("int")
    n_bullet = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
    ).cast("int")
    n_ell_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    ).cast("int")
    lower_words = F.split(F.trim(F.lower(text)), r"\s+")
    n_stop_distinct = sum(
        F.array_contains(lower_words, s).cast("int")
        for s in ["the", "and", "of", "to", "a"]
    ).cast("int")
    out = df.select(
        F.col(id_col).alias("id"),
        n_words.alias("n_words"),
        (
            (n_words >= F.lit(min_words)) & (n_words <= F.lit(max_words))
        ).alias("rule_word_count"),
        (
            (n_words > 0)
            & (F.lit(3) * n_words <= n_nonspace)
            & (n_nonspace <= F.lit(10) * n_words)
        ).alias("rule_mean_word_len"),
        (F.lit(10) * symbols <= n_words).alias("rule_symbol_ratio"),
        (
            (n_words > 0) & (F.lit(5) * n_alpha_words >= F.lit(4) * n_words)
        ).alias("rule_alpha_words"),
        (F.lit(10) * n_bullet <= F.lit(9) * n_lines).alias("rule_bullets"),
        (F.lit(10) * n_ell_lines <= F.lit(3) * n_lines).alias(
            "rule_ellipsis_lines"
        ),
        (n_stop_distinct >= 2).alias("rule_stopwords"),
    )
    rules = [c for c in out.columns if c.startswith("rule_")]
    passed = F.lit(True)
    for c in rules:
        passed = passed & F.col(c)
    return out.withColumn("pass_gopher", passed)


def ngram_novelty(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Corpus-level n-gram novelty: for each document, the share of its
    DISTINCT word n-grams whose earliest corpus occurrence (min id) is this
    document.  Low novelty = the doc is mostly re-used phrasing
    (memorization / boilerplate risk); the corpus-wide complement of the
    in-doc ``repetition_ratio`` and the scoring twin of
    ``dedup_span_coverage``.

    Scale shape: explode to DISTINCT (id, 16-byte gram digest) pairs, ONE
    groupBy shuffle on the digest to find each gram's min id, then a
    partial-agg count per doc.  The shuffle carries (digest, id) only —
    never text — so at 100 TB it is an equi-partitioned hash agg over
    ~24-byte rows, same budget class as dedup_exact.

    Returns (id, n_grams, n_novel, novelty_micro) where novelty_micro is
    round(1e6 * n_novel / n_grams) — integer-rounded AFTER the exact
    integer counts, so cross-engine stable.  Docs with fewer than ``n``
    words have zero n-grams and are reported with n_grams = 0,
    novelty_micro NULL.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col).alias("id"), toks.alias("t")).where(
        F.length(F.trim(F.col(text_col))) > 0
    )
    grams = base.where(F.size("t") >= n).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - n),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("t", i + 1, n))
                ),
            )
        ).alias("g"),
    )
    pairs = grams.distinct()
    first = pairs.groupBy("g").agg(F.min("id").alias("first_id"))
    per_doc = (
        pairs.join(first, "g")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("id") == F.col("first_id")).cast("int"))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    all_ids = df.select(F.col(id_col).alias("id"))
    return (
        all_ids.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            F.when(
                F.col("n_grams").isNotNull(),
                F.round(
                    F.col("n_novel") * F.lit(1000000.0) / F.col("n_grams")
                ).cast("bigint"),
            ).alias("novelty_micro"),
        )
    )


def token_entropy(df, id_col: str, text_col: str):
    """Per-document token (Shannon, log10) entropy of the doc's OWN token
    distribution — the vocabulary-diversity / gibberish signal (spam and
    keyword-stuffed docs have low entropy; random-character noise has
    anomalously high entropy for its length).  Returns
    (id, n_tokens, n_distinct, entropy_micro).

    Determinism (house pattern, see ``unigram_logprob``): each distinct
    token's contribution ``-(tf/n) * log10(tf/n)`` is quantized to an
    integer micro-value FIRST, and the per-doc aggregate is an exact
    BIGINT sum immune to float accumulation order.  The output stays the
    integer micro value — a final ``/1e6 round 4`` would reintroduce the
    double→decimal tie gap (Spark rounds the shortest decimal rendering
    HALF_UP, DuckDB rounds the binary value; an integer sum ending in
    ...50 splits them — observed live at sf0.001 doc 460).

    Scale: two shuffles, both id-keyed and partial-aggregated — per-doc
    term counts, then the per-doc sum; no corpus-global state at all.
    Extension operator per SURVEY §2.D."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n = tf.groupBy("id").agg(F.sum("tf").alias("n"))
    term = tf.join(n, "id").select(
        "id",
        "n",
        F.round(
            -(F.col("tf").cast("double") / F.col("n"))
            * F.log10(F.col("tf").cast("double") / F.col("n"))
            * 1000000,
            0,
        )
        .cast("bigint")
        .alias("q"),
    )
    return term.groupBy("id").agg(
        F.min("n").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum("q").cast("bigint").alias("entropy_micro"),
    )


def bigram_logprob(df, id_col: str, text_col: str):
    """Per-document mean bigram log10-probability under the corpus's own
    interpolated bigram LM — the CCNet-style LM quality score one rung
    above ``unigram_logprob``: repeated boilerplate scores HIGH (its
    bigrams are corpus-frequent), genuinely novel-but-fluent text sits in
    the middle, token soup scores LOW.

        P(w2 | w1) = 0.7 * c(w1 w2) / c(w1)  +  0.3 * c(w2) / N

    with c() corpus token/bigram occurrence counts and N total tokens
    (c(w1) >= c(w1 w2) always, so P <= 1 and > 0).  Returns
    (id, n_bigrams, sum_logprob_micro) over docs with >= 2 tokens — the
    mean is ``sum_logprob_micro / n_bigrams / 1e6``, left to the caller.

    Determinism: per distinct bigram, round(log10(P) * 1e6) is an integer;
    per-doc aggregation is an exact BIGINT sum, and the output STAYS
    integer (a final divide-and-round can land on a decimal tie where
    Spark's shortest-decimal HALF_UP and DuckDB's binary-value rounding
    split — see ``token_entropy``).

    Scale: every shuffle is term- or bigram-keyed with partial
    aggregation (corpus unigram counts, corpus bigram counts — derived
    from the already-reduced per-doc counts — and the per-doc sum); N
    folds in as a one-row broadcast.  Nothing is ever keyed on the
    document payload.  Extension operator per SURVEY §2.D."""
    t = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"), t.alias("t")
    )
    toks = base.select("id", F.explode("t").alias("tok"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    total = toks.select(F.count(F.lit(1)).alias("_total"))
    pairs = base.where(F.size("t") >= 2).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i + 1).alias("w1"),
                    F.element_at(F.col("t"), i + 2).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    tf = pairs.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    cb = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("cb"))
    qlp = (
        cb.join(uni.select(F.col("tok").alias("w1"), F.col("cu").alias("cu1")), "w1")
        .join(uni.select(F.col("tok").alias("w2"), F.col("cu").alias("cu2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.round(
                F.log10(
                    F.lit(0.7) * F.col("cb").cast("double") / F.col("cu1")
                    + F.lit(0.3) * F.col("cu2").cast("double") / F.col("_total")
                )
                * 1000000,
                0,
            )
            .cast("bigint")
            .alias("qlp"),
        )
    )
    return (
        tf.join(qlp, ["w1", "w2"])
        .groupBy("id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("qlp")).cast("bigint").alias(
                "sum_logprob_micro"
            ),
        )
    )


def pmi_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df_ppm: int = 900_000,
    min_pair: int = 2,
    top_k: int = 100,
) -> DataFrame:
    """Document-level pointwise-mutual-information co-occurrence: the
    ``top_k`` token pairs most over-represented in the same documents —
    the collocation/topic-structure probe (named entities, template
    phrases, and topical clusters surface at the top; a corpus whose top
    pairs are boilerplate navigation is telling you something).

    PMI = ln(P(x,y) / (P(x) P(y))) over document incidence.  ln is
    monotone, so ranking by PMI == ranking by the exact integer lift
    ``n_pair * n_docs * 1e6 // (df_x * df_y)`` (ppm of the independence
    expectation) — the emitted score, computed entirely in BIGINT floor
    division so it is bit-identical across engines (no float log ever
    feeds an ordering).  Overflow bound: n_pair * n_docs * 1e6 must fit a
    long — fine to ~3e6 docs; beyond that the same ratio computes in
    decimal(38,0), noted as the scale-up switch.

    Scale shape: explode to DISTINCT (id, token) incidence pairs; ONE
    groupBy on token for document frequencies; the df gate bounds the
    per-document self-join fan-out (tokens in > ``max_df_ppm`` ppm of the
    corpus — stopword-class — and tokens below ``min_df`` never enter pair
    generation: the standard PMI support filter, and the quadratic-blowup
    guard, since a doc with k kept tokens emits k*(k-1)/2 pairs).  The cap
    is a CORPUS FRACTION computed in-plan (``df * 1e6 <= max_df_ppm *
    n_docs``, exact integers), not an absolute count, so the same query is
    meaningful at sf0.001 and at 100 TB without retuning.  One groupBy
    shuffle on the (t1, t2) pair key; marginals ride along with the
    incidence rows; final top-k is TakeOrderedAndProject (partition heaps,
    k-row driver merge — no global sort).

    Returns (t1, t2, n_pair, df1, df2, n_docs, lift_ppm) — the top_k pairs
    by (lift_ppm DESC, t1, t2); (t1, t2) is unique so the order is total.

    The reference has no text-analysis surface (SQLite delegation,
    /root/reference/trough/read.py:66); extension operator per SURVEY §2.D.
    """
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    docfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df_"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    gated = (
        docfreq.crossJoin(F.broadcast(n_docs))
        .where(
            (F.col("df_") >= min_df)
            & (
                F.col("df_").cast("bigint") * F.lit(1_000_000)
                <= F.lit(max_df_ppm) * F.col("n_docs").cast("bigint")
            )
        )
        .select("tok", "df_")
    )
    kept = toks.join(gated, "tok")
    a = kept.select("id", F.col("tok").alias("t1"), F.col("df_").alias("df1"))
    b = kept.select("id", F.col("tok").alias("t2"), F.col("df_").alias("df2"))
    pairs = (
        a.join(b, "id")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pair"),
            F.min("df1").cast("bigint").alias("df1"),
            F.min("df2").cast("bigint").alias("df2"),
        )
        .where(F.col("n_pair") >= min_pair)
    )
    scored = pairs.crossJoin(F.broadcast(n_docs)).select(
        "t1",
        "t2",
        "n_pair",
        "df1",
        "df2",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.expr(
            "CAST(n_pair * n_docs * 1000000 DIV (df1 * df2) AS BIGINT)"
        ).alias("lift_ppm"),
    )
    return scored.orderBy(
        F.col("lift_ppm").desc(), F.col("t1"), F.col("t2")
    ).limit(top_k)


def c4_filters(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """C4-style page-level heuristic filters (Raffel et al. 2020 §2.2),
    the companion pass to ``gopher_rules`` — C4's signals are line- and
    marker-shaped where Gopher's are word-distribution-shaped:

    - ``rule_good_lines``: >= 3 "retained" lines, where a line is retained
      if it has >= 5 whitespace words AND ends in terminal punctuation
      (``. ! ? "``) — C4 drops other lines; a page with < 3 survivors is
      dropped.
    - ``rule_min_sentences``: >= 3 sentence-terminal marks (``[.!?]``) in
      the raw text (C4 keeps pages with >= 3 sentences).
    - ``rule_no_lorem``: no ``lorem ipsum`` (case-insensitive).
    - ``rule_no_brace``: no ``{`` anywhere (code/JS leak marker).
    - ``rule_no_javascript``: no line mentioning ``javascript``.
    - ``rule_no_policy``: none of C4's policy markers (``terms of use``,
      ``privacy policy``, ``cookie policy``, ``uses cookies``).

    ``pass_c4`` is the conjunction.  Every count is integer and every test
    an integer comparison (house determinism pattern, see gopher_rules) —
    hash-stable across engines.  Pure map over each row, no shuffle; at
    100 TB this fuses into the scan with the other quality gates.

    Reference has no quality surface (/root/reference/trough/read.py:66);
    extension operator per SURVEY §2.D.
    """
    text = F.col(text_col)
    low = F.lower(text)
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("int")
    good_line = lambda l: (  # noqa: E731 — inline predicate, used twice
        F.size(F.split(F.trim(l), r"\s+")) >= 5
    ) & l.rlike(r'[.!?"]\s*$')
    n_good_lines = F.size(F.filter(lines, good_line)).cast("int")
    n_sentences = (F.size(F.split(text, r"[.!?]")) - 1).cast("int")
    has_lorem = low.contains("lorem ipsum")
    has_brace = text.contains("{")
    n_js_lines = F.size(
        F.filter(lines, lambda l: F.lower(l).contains("javascript"))
    ).cast("int")
    has_policy = (
        low.contains("terms of use")
        | low.contains("privacy policy")
        | low.contains("cookie policy")
        | low.contains("uses cookies")
    )
    out = df.select(
        F.col(id_col).alias("id"),
        n_lines.alias("n_lines"),
        n_good_lines.alias("n_good_lines"),
        n_sentences.alias("n_sentences"),
        (n_good_lines >= 3).alias("rule_good_lines"),
        (n_sentences >= 3).alias("rule_min_sentences"),
        (~has_lorem).alias("rule_no_lorem"),
        (~has_brace).alias("rule_no_brace"),
        (n_js_lines == 0).alias("rule_no_javascript"),
        (~has_policy).alias("rule_no_policy"),
    )
    passed = F.lit(True)
    for c in out.columns:
        if c.startswith("rule_"):
            passed = passed & F.col(c)
    return out.withColumn("pass_c4", passed)


def ccnet_buckets(
    df: DataFrame, id_col: str, text_col: str, lang_col: str
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): per-language
    head/middle/tail thirds by language-model score — the standard
    pretraining-corpus triage (train on head+middle, drop or downsample
    tail).  The LM here is the corpus's own unigram model
    (``unigram_logprob``, quantize-then-sum exact); ranking runs on the
    rounded score with the doc id as the total-order tie-break, so the
    NTILE boundary is engine-exact.

    Scale: the LM scoring is the cost (term-keyed shuffles, see
    unigram_logprob); bucketing adds ONE per-language window — at 100 TB
    that exchange is on the language key, the same partitioning the
    multilingual sampling operators already use.

    Returns (id, lang, n_tokens, mean_logprob, bucket 'head'|'middle'|'tail').
    """
    from pyspark.sql.window import Window

    lp = unigram_logprob(df, id_col, text_col)
    langs = df.select(F.col(id_col).alias("id"), F.col(lang_col).alias("lang"))
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_logprob").desc(), F.col("id")
    )
    t = F.ntile(3).over(w)
    return (
        lp.join(langs, "id")
        .select(
            "id",
            "lang",
            "n_tokens",
            "mean_logprob",
            F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail").alias("bucket"),
        )
    )


# BPE merge training: symbols are packed as \x01sym\x02 runs inside one
# string so "apply one merge" is a plain left-to-right replace() — the
# non-overlapping left-to-right scan of replace IS the BPE merge rule
# ("aaaa" + merge(a,a) -> "aa","aa"), and the delimiters make symbol
# boundaries unambiguous without arrays-of-arrays plumbing.  The same
# representation drives the DuckDB oracle (queries/text.py), so training
# is auditable bit-for-bit.
_BPE_SOH = "\x01"
_BPE_STX = "\x02"


def _bpe_syms(packed):
    """Recover the symbol array from a packed string."""
    return F.filter(
        F.split(F.replace(packed, F.lit(_BPE_SOH), F.lit("")), _BPE_STX),
        lambda s: s != "",
    )


def bpe_train_merges(
    df: DataFrame, id_col: str, text_col: str, n_merges: int = 3
) -> DataFrame:
    """Byte-pair-encoding merge training over the corpus: learn the first
    ``n_merges`` merges (the tokenizer-induction step a training-data
    pipeline runs before token accounting; `bpe_ish_tokens` above only
    APPLIES a fixed regex — this TRAINS the vocabulary).

    Returns (merge_rank, left_sym, right_sym, merged, pair_count), one row
    per learned merge, tie-broken deterministically (count DESC, then
    left/right symbol ASC) so the result is engine-reproducible.

    Scale: the corpus-sized work happens ONCE — the word-count groupBy
    (shuffle carries (word, count)).  Every merge iteration then runs on
    the DISTINCT-WORD table (vocabulary-sized, millions of rows at 100 TB,
    not corpus-sized): one pair-count partial aggregate + a 1-row argmax
    collect per merge, with `localCheckpoint` truncating lineage per round
    (the kmeans_train pattern — without it iteration N replans all N
    replaces).  This is how single-node BPE trainers scale too (HF
    tokenizers train on word counts); the distributed win is the word
    count itself plus vocab-parallel pair counting.

    Assumes symbols never contain the \\x01/\\x02 delimiters (true for any
    whitespace-tokenized text corpus; control characters in tokens would
    corrupt symbol boundaries — documented, not checked row-wise).
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = (
        df.select(F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    packed0 = F.concat_ws(
        "",
        F.transform(
            F.filter(F.split(F.col("w"), ""), lambda c: c != ""),
            lambda c: F.concat(F.lit(_BPE_SOH), c, F.lit(_BPE_STX)),
        ),
    )
    vocab = words.select("cnt", packed0.alias("packed")).localCheckpoint(eager=True)
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        syms = _bpe_syms(F.col("packed"))
        pairs = (
            vocab.select("cnt", syms.alias("syms"))
            .filter(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("l"),
                            F.element_at(F.col("syms"), i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = (
            pairs.orderBy(F.col("pair_count").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["pair_count"])
        merges.append((rank, l, r, l + r, c))
        vocab = vocab.withColumn(
            "packed",
            F.replace(
                F.col("packed"),
                F.lit(_BPE_SOH + l + _BPE_STX + _BPE_SOH + r + _BPE_STX),
                F.lit(_BPE_SOH + l + r + _BPE_STX),
            ),
        ).localCheckpoint(eager=True)
    return df.sparkSession.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def bpe_segment_counts(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Apply a trained BPE merge list (rank order) and count the resulting
    tokens per document — the accounting step after `bpe_train_merges`
    (true token budgets under YOUR tokenizer, not a whitespace proxy).

    Returns (id, n_words, n_bpe_tokens).  ENTIRELY map-side: the document
    text packs into the \\x01sym\\x02 representation with an \\x03 word
    separator (merges never cross words), each merge is one left-to-right
    replace, and the token count is the surviving \\x02 count — no
    shuffle, no UDF, whole-stage-codegen string ops.
    """
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: w != ""
    )
    packed = F.concat_ws(
        "\x03",
        F.transform(
            words,
            lambda w: F.concat_ws(
                "",
                F.transform(
                    F.filter(F.split(w, ""), lambda c: c != ""),
                    lambda c: F.concat(F.lit(_BPE_SOH), c, F.lit(_BPE_STX)),
                ),
            ),
        ),
    )
    out = df.select(F.col(id_col).alias("id"), F.size(words).alias("n_words"), packed.alias("_p"))
    for left, right in merges:
        out = out.withColumn(
            "_p",
            F.replace(
                F.col("_p"),
                F.lit(_BPE_SOH + left + _BPE_STX + _BPE_SOH + right + _BPE_STX),
                F.lit(_BPE_SOH + left + right + _BPE_STX),
            ),
        )
    n_tokens = (
        F.length("_p") - F.length(F.replace(F.col("_p"), F.lit(_BPE_STX), F.lit("")))
    ).cast("bigint")
    return out.select("id", "n_words", n_tokens.alias("n_bpe_tokens"))


def bpe_vocab(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Vocabulary export for a trained BPE tokenizer: base characters
    (every distinct character of the whitespace-tokenized, lowered corpus,
    id-assigned in sorted order starting at 0) followed by the merged
    symbols in merge-rank order — the id table a training loader ships
    alongside the token-id shards.

    Returns (token_id int, symbol string, kind 'char'|'merge').

    Scale: the corpus-sized work is one character-distinct (map-side
    partial aggregation shuffling single characters); the id-assigning
    window runs on the VOCABULARY (chars + merges — thousands of rows at
    any corpus size), where its single-partition sort is free.
    """
    chars = (
        df.select(F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .select(F.explode(F.filter(F.split(F.col("w"), ""), lambda c: c != "")).alias("symbol"))
        .distinct()
        .select("symbol", F.lit("char").alias("kind"), F.lit(0).alias("grp"), F.lit(0).alias("rnk"))
    )
    sess = df.sparkSession
    merged = sess.createDataFrame(
        [(left + right, "merge", 1, rank) for rank, (left, right) in enumerate(merges, start=1)],
        "symbol string, kind string, grp int, rnk int",
    )
    w = Window.orderBy("grp", F.when(F.col("grp") == 0, F.col("symbol")), "rnk")
    return (
        chars.unionByName(merged)
        .select((F.row_number().over(w) - 1).cast("int").alias("token_id"), "symbol", "kind")
    )


def bpe_encode_ids(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    unk_id: int = -1,
) -> DataFrame:
    """Encode documents to BPE token IDS — the array a training loader
    actually consumes (`bpe_segment_counts` above only COUNTS tokens).

    ``vocab`` maps symbol -> id (driver-side dict, vocabulary-sized —
    collect `bpe_vocab`; the same bounded-small-side pattern as the
    broadcast codebooks in vectors.py).  Symbols absent from the vocab
    encode as ``unk_id``.

    Returns (id, n_tokens bigint, token_ids array<int>).

    Scale: ENTIRELY map-side, like the counting path — pack, replace per
    merge, split out the symbol sequence, and map symbols through a
    constant map literal (embedded in the plan, so every executor applies
    it without a join or shuffle; at extreme vocab sizes the literal costs
    plan bytes, never a shuffle).  Assumes symbols never contain the
    \\x01/\\x02/\\x03 delimiters (same documented caveat as training).
    """
    words = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda w: w != ""
    )
    packed = F.concat_ws(
        "\x03",
        F.transform(
            words,
            lambda w: F.concat_ws(
                "",
                F.transform(
                    F.filter(F.split(w, ""), lambda c: c != ""),
                    lambda c: F.concat(F.lit(_BPE_SOH), c, F.lit(_BPE_STX)),
                ),
            ),
        ),
    )
    out = df.select(F.col(id_col).alias("id"), packed.alias("_p"))
    for left, right in merges:
        out = out.withColumn(
            "_p",
            F.replace(
                F.col("_p"),
                F.lit(_BPE_SOH + left + _BPE_STX + _BPE_SOH + right + _BPE_STX),
                F.lit(_BPE_SOH + left + right + _BPE_STX),
            ),
        )
    syms = F.filter(
        F.split(
            F.replace(F.replace(F.col("_p"), F.lit(_BPE_SOH), F.lit("")), F.lit("\x03"), F.lit("")),
            _BPE_STX,
        ),
        lambda s: s != "",
    )
    vmap = F.map_from_arrays(
        F.lit(list(vocab.keys())), F.lit([int(v) for v in vocab.values()])
    )
    ids = F.transform(
        syms, lambda s: F.coalesce(F.element_at(vmap, s), F.lit(int(unk_id))).cast("int")
    )
    return out.select(
        "id",
        F.size(ids).cast("bigint").alias("n_tokens"),
        ids.alias("token_ids"),
    )
