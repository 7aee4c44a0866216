"""Plan-shape assertions for the round-2 operators: shuffle counts and
map-only guarantees that must hold for the 100 TB story (a regression that
adds an Exchange here is a scale bug even if results stay correct)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trough_spark.operators import sampling as SA
from trough_spark.operators import sketches as SK


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def test_hash_sample_is_map_only(spark):
    df = spark.range(1000).select(F.col("id"))
    assert _exchanges(SA.hash_sample(df, "id", 0.5)) == 0


def test_hash_split_is_map_only(spark):
    df = spark.range(1000)
    out = SA.hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert _exchanges(out) == 0


def test_stratified_sample_is_map_only(spark):
    df = spark.range(1000).select("id", (F.col("id") % 3).cast("string").alias("g"))
    out = SA.stratified_sample(df, "id", "g", {"0": 0.5, "1": 0.1, "2": 0.9})
    assert _exchanges(out) == 0


def test_pack_sequences_single_shuffle(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 4).alias("g"), F.lit(100).alias("n")
    )
    out = SA.pack_sequences(df, "id", "n", 256, partition_by="g")
    assert _exchanges(out) == 1  # exactly the window shuffle


def test_cms_build_single_shuffle_partial_agg(spark):
    df = spark.range(5000).select((F.col("id") % 50).cast("string").alias("k"))
    sketch = SK.cms_build(df, "k")
    plan = sketch._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one shuffle to d x w cells
    assert "partial" in plan.lower()  # map-side combine before it


def test_simhash_pairs_full_recall_within_hamming(spark):
    """Pigeonhole property live: two docs whose fingerprints differ by <= 3
    bits must be emitted as a pair."""
    from trough_spark.operators import dedup as D

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).strip()
    df = spark.createDataFrame(
        [(1, base), (2, base + " lambda"), (3, "totally different words entirely")],
        "doc_id bigint, text string",
    )
    fp = {r["id"]: r["simhash"] for r in D.simhash(df, "doc_id", "text").collect()}
    pairs = {
        (r["id1"], r["id2"])
        for r in D.simhash_pairs(df, "doc_id", "text").collect()
    }
    ham12 = bin(fp[1] ^ fp[2]).count("1")
    if ham12 <= 3:
        assert (1, 2) in pairs
    for (a, b) in pairs:
        assert bin(fp[a] ^ fp[b]).count("1") <= 3


def test_bloom_probe_is_map_only(spark):
    # The probe-side membership check must be a pure map after the tiny
    # broadcast — an Exchange on the fact side would defeat the prefilter.
    from trough_spark.operators import bloom as B

    build = spark.range(100).select((F.col("id") * 7).alias("key"))
    facts = spark.range(5000).select((F.col("id") % 600).alias("key"))
    bloom = B.bloom_build(build, "key")
    marked = B.bloom_might_contain(facts, "key", bloom)
    plan = marked._jdf.queryExecution().executedPlan().toString()
    # Build side aggregates (1-2 exchanges on <=64 rows is fine); the probe
    # side must join only via BroadcastExchange — no shuffle exchange may
    # consume the fact scan.
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    import re

    assert not re.search(r"Exchange hashpartitioning\(key", plan), plan


def test_bloom_no_false_negatives(spark):
    from trough_spark.operators import bloom as B

    build = spark.range(200).select((F.col("id") * 13 + 5).alias("key"))
    probe = spark.range(3000).select(F.col("id").alias("key"))
    bloom = B.bloom_build(build, "key", k=4, n_words=32)
    marked = B.bloom_might_contain(probe, "key", bloom, k=4, n_words=32)
    members = {r.key for r in build.collect()}
    rows = marked.collect()
    for r in rows:
        if r.key in members:
            assert r.bloom_pass, f"false negative for {r.key}"
    # and the filter actually prunes something at this sizing
    passed = sum(1 for r in rows if r.bloom_pass)
    assert passed < len(rows)


def test_equidepth_histogram_no_global_row_sort(spark):
    # The row-scale data must never pass through a single-partition
    # Exchange — only the tiny distinct-values table may.
    from trough_spark.operators import sketches as SK2

    df = spark.range(10000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    out = SK2.equidepth_histogram(df, "v", "id", 8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the ranked side is windowed PARTITIONED BY v (hashpartitioning);
    # SinglePartition exchanges exist only on the distinct-value / total
    # branches, which follow an aggregate, never the raw scan directly.
    assert "hashpartitioning(v" in plan


def test_surt_canonicalize_is_map_only(spark):
    from trough_spark.operators import text as X

    df = spark.createDataFrame(
        [(1, "https://WWW.A.Example.COM/x?utm_source=f&b=2&a=1")], "id bigint, url string"
    )
    assert _exchanges(X.surt_canonicalize(df, "url")) == 0


def test_html_strip_is_map_only_and_correct(spark):
    from trough_spark.operators import text as X

    df = spark.createDataFrame(
        [(1, '<html><head><style>p{color:red}</style></head>'
             '<body><!-- note --><p  class="x">Hello &amp;\n <b>world</b>'
             '&nbsp;&lt;3</p><script>var x = "<p>";</script></body></html>')],
        "id bigint, html string",
    )
    out = df.select("id", X.html_strip(F.col("html")).alias("t"))
    assert _exchanges(out) == 0
    assert out.collect()[0]["t"] == "Hello & world <3"


def test_zvalue_is_map_only_and_codegen(spark):
    from trough_spark.operators import layout as L

    df = spark.range(1000).select(
        (F.col("id") % 64).alias("x"), (F.col("id") % 37).alias("y")
    )
    out = df.select(L.zvalue(F.col("x"), F.col("y")).alias("z"))
    assert _exchanges(out) == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.lstrip().startswith("*(")  # whole-stage codegen'd project


def test_pq_encode_single_shuffle_broadcast_codebook(spark):
    """Encoding = broadcast codebook join + one argmin combine shuffle; a
    shuffled codebook join here would be a scale bug."""
    from trough_spark.operators import vectors as V

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array([(F.col("id") * (i + 1) % 97).cast("float") for i in range(8)]).alias("v"),
    )
    cb = V.pq_split(emb.filter(F.col("vec_id") < 4), "vec_id", "v", 2, 8).select(
        F.col("id").alias("code"), "sub_id", F.col("sv").alias("cv")
    )
    codes = V.pq_encode(emb, "vec_id", "v", cb, m=2, dim=8)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # shuffles: the argmin groupBy (+ possibly one broadcast-side exchange,
    # which moves k*m rows, not data) — the corpus itself shuffles once
    assert plan.count("Exchange hashpartitioning") <= 1


def test_fuzzy_pairs_no_cartesian(spark):
    """The blocked join must plan as an equi-join on the block key, never a
    cartesian/nested-loop over the corpus."""
    from trough_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, f"tok{i % 5} name{i}") for i in range(100)], "id bigint, name string"
    )
    out = D.fuzzy_levenshtein_pairs(df, "id", "name", max_distance=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Join" in plan


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"),
    reason="driver testdata not present on this machine",
)
def test_no_query_plans_cartesian_or_row_python(spark):
    """Fleet-wide plan hygiene: no registered query may plan a cartesian
    product or a row-at-a-time Python eval (BatchEvalPython) — the two
    plan nodes that silently turn a 100 TB job into a forever job.  Arrow
    batch nodes (ArrowEvalPython / mapInPandas / FlatMapGroupsInPandas)
    are the sanctioned Python paths and remain allowed."""
    from trough_spark.queries import QUERIES, load_all

    load_all()
    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name, fn in QUERIES.items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        flags = [
            f
            for f, marker in (
                ("cartesian", "CartesianProduct"),
                ("row-python-udf", "BatchEvalPython"),
            )
            if marker in plan
        ]
        if flags:
            offenders[name] = flags
    assert not offenders, f"scale-hostile plan nodes: {offenders}"


def test_literal_glob_stays_native_nonliteral_falls_back(spark):
    """Literal GLOB patterns compile to RLIKE regex literals at translation
    time and must never plan BatchEvalPython; non-literal patterns use the
    registered TROUGH_GLOB_REGEX row-time compiler (round 10) and must
    agree with the static translation on identical pattern values."""
    from trough_spark import dialect
    from trough_spark.functions import register_all

    register_all(spark)
    spark.createDataFrame(
        [("apple", "a*"), ("banana", "a*"), ("cherry", "[cx]*"), ("axe", None)],
        "name string, pat string",
    ).createOrReplaceTempView("globt")
    lit_sql = dialect.sqlite_to_spark("SELECT name FROM globt WHERE name GLOB 'a*'")
    lit = spark.sql(lit_sql)
    plan = lit._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "TROUGH_GLOB_REGEX" not in lit_sql
    assert {r["name"] for r in lit.collect()} == {"apple", "axe"}
    dyn = spark.sql(
        dialect.sqlite_to_spark("SELECT name FROM globt WHERE name GLOB pat")
    )
    # 'axe' carries a NULL pattern -> NULL predicate -> excluded (as SQLite)
    assert {r["name"] for r in dyn.collect()} == {"apple", "cherry"}
    # function form returns 0/1/NULL like SQLite
    vals = spark.sql(
        dialect.sqlite_to_spark("SELECT glob(pat, name) AS v FROM globt")
    ).collect()
    assert sorted((r["v"] for r in vals), key=lambda v: (v is None, v)) == [0, 1, 1, None]


def test_hashed_classifier_is_map_only(spark):
    """Classifier inference must stay a pure map — one projection, no
    explode, no shuffle, no Python eval (the 100 TB corpus-scoring claim)."""
    from trough_spark.operators import text as X

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "")], "doc_id bigint, text string"
    )
    out = X.hashed_classifier(df, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert _exchanges(out) == 0
    assert "Generate" not in plan and "BatchEvalPython" not in plan


def test_phash_fingerprints_are_map_only(spark):
    from trough_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    media = M.synthesize_media(docs, "doc_id", "text")
    # the fingerprint stage must be pure map: only the banded pair join
    # (a separate operator) is allowed to shuffle
    assert _exchanges(M.perceptual_hash(media)) == 0


def test_chunk_rewrite_shuffles_hashes_not_text(spark):
    from trough_spark.operators.dedup import chunk_dedup_rewrite

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(40))) for i in range(20)],
        "doc_id long, text string",
    )
    df = chunk_dedup_rewrite(docs, "doc_id", "text", chunk=20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # winner agg + membership join + kept-idx rollup + id-keyed reattach:
    # a bounded number of exchanges, none carrying chunk text
    assert plan.count("Exchange") <= 6, plan
    assert "CartesianProduct" not in plan
    # every hashpartitioning key is an id or the 16-byte chunk hash — chunk
    # text exists only inside map-side projections, never as a shuffle key
    import re as _re

    for m in _re.finditer(r"Exchange hashpartitioning\(([a-zA-Z0-9_#]+)", plan):
        assert m.group(1).split("#")[0] in {"id", "h", "w"}, m.group(0)


def test_cosine_pairs_scope_bound_enforced(spark):
    """The one quadratic operator refuses unbounded corpora: above max_rows
    it raises with scoping guidance unless exact_baseline=True is an
    explicit opt-in — the discipline a 100 TB user must apply."""
    from trough_spark.operators.similarity import cosine_pairs

    df = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=7) for _ in range(4)]).alias("embedding"),
    )
    with pytest.raises(ValueError, match="max_rows"):
        cosine_pairs(df, "vec_id", "embedding", threshold=0.9, max_rows=10)
    # explicit opt-in runs (plan builds; no guard count job fires)
    out = cosine_pairs(
        df, "vec_id", "embedding", threshold=0.999, max_rows=10, exact_baseline=True
    )
    out.collect()
    # the registered query's input is bounded: guard active at its defaults
    from trough_spark.queries import QUERIES, load_all

    load_all()
    res = QUERIES["sim_cosine_pairs"](spark, "/root/testdata/sf0.001")
    assert res.limit(1).count() >= 0  # builds and runs under the default guard


def test_train_order_window_is_keys_first(spark):
    """VERDICT r6 item 4: train_order's shard/pos window must run over a
    projection of (key, hash) only — document payloads never enter the
    data-scale sort exchange, regardless of what columns the caller
    passes.  Asserted structurally on the Window node's child output."""
    from trough_spark.operators.sampling import train_order

    docs = spark.createDataFrame(
        [(i, "x" * 200, float(i)) for i in range(40)],
        "doc_id long, text string, score double",
    )
    out = train_order(docs, "doc_id", n_shards=4, salt="e0")
    qe = out._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    txt = qe.explainString(mode)
    import re as _re

    win_ids = _re.findall(r"Window \((\d+)\)", txt)
    assert win_ids, "expected a Window node in the train_order plan:\n" + txt
    for wid in win_ids:
        m = _re.search(rf"\({wid}\) Window\nInput \[\d+\]: \[([^\]]*)\]", txt)
        assert m, txt
        names = {c.strip().split("#")[0] for c in m.group(1).split(",")}
        assert names <= {"doc_id", "_train_h", "shard"}, names
    # correctness: payload columns survive, (shard, pos) deterministic
    rows = {r["doc_id"]: (r["shard"], r["pos"], r["text"], r["score"]) for r in out.collect()}
    assert len(rows) == 40
    keyed = train_order(docs.select("doc_id"), "doc_id", n_shards=4, salt="e0")
    for r in keyed.collect():
        assert rows[r["doc_id"]][:2] == (r["shard"], r["pos"])


def test_repeat_upsample_is_map_only(spark):
    """repeat_upsample must stay shuffle-free: floor/coin/explode are all
    per-row — the materialized training list is corpus x weight rows with
    no exchange anywhere (round 9)."""
    df = spark.range(500).select(
        F.col("id"), (F.lit(1.0) + (F.col("id") % 4) * F.lit(0.5)).alias("w")
    )
    out = SA.repeat_upsample(df, "id", F.col("w"))
    assert _exchanges(out) == 0
    rows = out.groupBy("id").count().collect()
    by_id = {r["id"]: r["count"] for r in rows}
    # floor(w) <= copies <= ceil(w), and integral weights are exact
    for i, n in by_id.items():
        w = 1.0 + (i % 4) * 0.5
        assert int(w) <= n <= -(-int(w * 2) // 2), (i, w, n)
        if w == int(w):
            assert n == int(w)


def test_cross_decontaminate_broadcasts_reference(spark):
    """cross_corpus_near_dup with the default broadcast flag must plan a
    BroadcastHashJoin for the band join (the 100 TB corpus side never
    shuffles for candidate generation) and agree with the self-join LSH
    pair list restricted to cross pairs (round 9)."""
    from trough_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} x{i % 5} y{i % 3} common tail tokens here", ) for i in range(40)],
        "id int, text string",
    )
    sig = D.minhash_signature_vector(docs, "id", "text", num_perm=8, n=3)
    corpus, ref = sig.filter("id >= 10"), sig.filter("id < 10")
    out = D.cross_corpus_near_dup(corpus, ref)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    got = {r["id"] for r in out.filter("is_hit = 1").collect()}
    pairs = D.minhash_lsh_candidates_wide(sig, num_perm=8, rows_per_band=2)
    expected = {
        r["hi"]
        for r in pairs.selectExpr(
            "greatest(id1, id2) AS hi", "least(id1, id2) AS lo"
        ).filter("lo < 10 AND hi >= 10").collect()
    }
    assert got == expected


def test_cross_decontaminate_reports_short_docs(spark):
    """Docs with fewer than n tokens get no minhash signature row (empty
    shingle array -> explode drops them), so a spine built from the
    signature table silently omits them.  With corpus_ids passed, the
    report must emit (id, 0, 0) for every signature-less corpus doc —
    matching the oracle's FROM documents LEFT JOIN hits shape (ADVICE r9,
    medium)."""
    from trough_spark.operators import dedup as D

    rows = [(i, f"w{i % 7} x{i % 5} y{i % 3} common tail tokens here") for i in range(20)]
    rows += [(100, "tiny"), (101, "two words"), (102, "")]  # < 3 tokens: no signature
    docs = spark.createDataFrame(rows, "id int, text string")
    sig = D.minhash_signature_vector(docs, "id", "text", num_perm=8, n=3)
    corpus_sig, ref_sig = sig.filter("id >= 10"), sig.filter("id < 10")
    assert corpus_sig.filter("id >= 100").count() == 0  # precondition: dropped
    spine = docs.filter("id >= 10").select("id")
    out = D.cross_corpus_near_dup(corpus_sig, ref_sig, corpus_ids=spine)
    got = {r["id"]: (r["n_ref_matches"], r["is_hit"]) for r in out.collect()}
    assert set(got) == {i for i in range(10, 20)} | {100, 101, 102}
    for short_id in (100, 101, 102):
        assert got[short_id] == (0, 0)


def test_bpe_segment_apply_is_map_only(spark):
    """bpe_segment_counts (the APPLY step, merges already trained) must be
    shuffle-free: packing, k replaces, and the token count are all per-row
    string expressions (round 9)."""
    from trough_spark.operators.text import bpe_segment_counts

    docs = spark.createDataFrame(
        [(1, "aa ab ba"), (2, "abab aabb")], "doc_id int, text string"
    )
    out = bpe_segment_counts(docs, "doc_id", "text", [("a", "a"), ("a", "b")])
    assert _exchanges(out) == 0
    rows = {r["id"]: (r["n_words"], r["n_bpe_tokens"]) for r in out.collect()}
    # "aa ab ba": [aa][ab][b a] -> 1+1+2 = 4 symbols after merges
    assert rows[1] == (3, 4)
    # "abab aabb": a,b,a,b -> ab,ab (2); a,a,b,b -> aa,b,b -> (merge ab needs
    # adjacent a,b: aa|b|b has none) 3 -> total 5
    assert rows[2] == (2, 5)
