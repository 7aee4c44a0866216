"""Connected components over candidate-pair graphs → dedup clusters.

The missing last step of near-duplicate removal: LSH/Jaccard stages emit
*pairs*, but retention decisions need *clusters* (a dup group is the
transitive closure of its pairs — A~B, B~C must collapse to one kept doc
even if A~C was never emitted).  `connected_components` computes the
closure with iterative min-label propagation on DataFrames:

    comp(v) ← min(comp(v), min over neighbors comp(u))   until fixpoint

Each round is one equi-join (messages along edges) + one groupBy-min
(partial-aggregated map-side), with `localCheckpoint` truncating the plan
so lineage doesn't grow with rounds.  Rounds needed = graph diameter —
for dedup graphs (small dense cliques) that's 2-3; for adversarially long
chains the round count grows and the alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) halves it — noted as the upgrade path, not needed for
dup-cluster shapes.

Label arithmetic is integer min over doc ids, so results are engine-exact;
the DuckDB oracle computes the same closure with WITH RECURSIVE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 25,
) -> DataFrame:
    """(id, comp) for every node, comp = min node id reachable through
    ``edges`` (undirected).  Converges in diameter rounds; stops early via
    an emptiness probe on the changed-label set.  ``max_iter`` bounds
    adversarial chains — on hitting it the labeling is still a valid
    partial merge (over-segmented, never wrongly merged).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = e.localCheckpoint(eager=True)
    # only edge-touching nodes can ever change label — iterate over that
    # (usually much smaller) set and re-attach isolated nodes at the end.
    # In a dedup graph the touched set is the near-dup docs, a sliver of
    # the corpus, so every propagation round works on O(dups), not O(docs).
    all_nodes = nodes.select(F.col(id_col).alias("id"))
    touched = all_nodes.join(
        e.select(F.col("a").alias("id")).distinct(), "id", "left_semi"
    )
    isolated = all_nodes.join(touched, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    labels = touched.select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint(eager=True)

    def _label_sum(frame) -> object:
        # decimal(38,0): exact at any scale (1e12 nodes x 1e12 max id
        # overflows int64; decimal sums never lose a unit)
        return frame.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    # Fixpoint test is an EXACT aggregate, not a join: labels only ever
    # DECREASE (min-propagation), so sum(comp) is strictly monotone until
    # convergence and equal sums <=> identical labelings.  One map-side
    # partial-aggregated scan of the checkpointed frame per round replaces
    # the old per-round join + isEmpty probe (a shuffle per round gone).
    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        msgs = e.join(
            labels.select(F.col("id").alias("b"), "comp"), "b"
        ).select(F.col("a").alias("id"), "comp")
        new = (
            labels.unionByName(msgs)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        cur_sum = _label_sum(new)
        labels = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.unionByName(isolated)


def keep_canonical(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Per-document retention verdict from a component labeling: canonical
    (kept) doc = the minimum id of its cluster.  Returns the docs' id column
    plus (canonical_id, cluster_size, is_canonical).  One broadcast-or-
    shuffle join on id + one small aggregate on comp."""
    comp = components.select(
        F.col("id").alias(id_col), F.col("comp").alias("canonical_id")
    )
    sizes = components.groupBy("comp").agg(
        F.count(F.lit(1)).alias("cluster_size")
    ).select(F.col("comp").alias("canonical_id"), "cluster_size")
    return (
        docs.select(id_col)
        .join(comp, id_col)
        .join(sizes, "canonical_id")
        .select(
            id_col,
            "canonical_id",
            "cluster_size",
            F.when(F.col(id_col) == F.col("canonical_id"), 1)
            .otherwise(0)
            .alias("is_canonical"),
        )
    )


def keep_best(
    scored: DataFrame,
    components: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-aware retention from a component labeling: the kept doc per
    cluster is the one with the HIGHEST integer ``score_col`` (ties broken
    to the smallest id) — what production curation does (FineWeb /
    RefinedWeb keep the best-quality member, not the smallest id, which
    `keep_canonical` models).

    ``scored`` must carry one row per node: (id_col, score_col) with an
    INTEGER score.  Exactness: the arg-max runs on the composite key
    ``score * 1e10 - id`` (same device as pipeline_url_dedup), exact in a
    long for score < 9e8 and id < 1e10 — no float ordering anywhere.

    Scale: one id-keyed join (scored x components) + ONE partial-aggregable
    groupBy on the cluster label (max_by collapses each cluster map-side)
    + a join back on the label.  No window sort, no per-cluster shuffle of
    document bodies.

    Returns (id_col, cluster_id, keep_id, cluster_size, is_kept).
    """
    lab = components.select(
        F.col("id").alias(id_col), F.col("comp").alias("cluster_id")
    )
    joined = scored.select(id_col, score_col).join(lab, id_col)
    best = joined.groupBy("cluster_id").agg(
        F.expr(f"max_by({id_col}, {score_col} * 10000000000 - {id_col})").alias(
            "keep_id"
        ),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return (
        lab.join(best, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            "keep_id",
            "cluster_size",
            F.when(F.col(id_col) == F.col("keep_id"), 1).otherwise(0).alias("is_kept"),
        )
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "id1",
    dst: str = "id2",
    max_iter: int = 20,
) -> DataFrame:
    """(id, comp) via alternating large-star/small-star (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014).  Same
    contract as `connected_components`, different convergence: label
    propagation needs diameter rounds, star contraction needs
    O(log diameter) — the right variant when dup chains are long (page
    series, boilerplate families) rather than clique-like.

    Each phase is one groupBy-min + one equi-join on the edge list, which
    SHRINKS monotonically toward the star forest (propagation's edge list
    never shrinks), so later rounds get cheaper at 100 TB.  Fixpoint is
    detected exactly (same count + empty anti-join), not by checksum."""
    e = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = nodes.select(F.col(id_col).alias("id"))
    touched = all_nodes.join(
        e.select(F.col("hi").alias("id"))
        .unionByName(e.select(F.col("lo").alias("id")))
        .distinct(),
        "id",
        "left_semi",
    ).localCheckpoint(eager=True)
    isolated = all_nodes.join(touched, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    prev_n = e.count()
    for _ in range(max_iter):
        # large-star: every neighbor v > u links to min(N(u) ∪ {u})
        bidir = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = bidir.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # checkpointed: consumed twice below (smins + the join) — without
        # this the whole large-star subtree recomputes per consumer
        large = (
            bidir.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: smaller neighbors (and u itself) link to the min
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(smins, "hi")
            .select(F.col("lo").alias("v"), F.col("m"))
            .where(F.col("v") != F.col("m"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .unionByName(smins.select(F.col("hi"), F.col("m").alias("lo")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = small.count()
        # counts short-circuit the (more expensive) exact anti-join check;
        # prev_n is carried forward so the old edge list is never recounted
        same = n == prev_n and small.join(e, ["hi", "lo"], "left_anti").isEmpty()
        prev_n = n
        e = small
        if same:
            break
    comp = e.groupBy("hi").agg(F.min("lo").alias("comp")).select(
        F.col("hi").alias("id"), "comp"
    )
    roots = touched.join(comp, "id", "left_anti").select(
        "id", F.col("id").alias("comp")
    )
    return comp.unionByName(roots).unionByName(isolated)
