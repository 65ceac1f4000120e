"""LSH hot-bucket capping + streaming dedup (dropDuplicates w/ watermark)."""

from pyspark.sql import functions as F

from datalakehouse_spark.io import load_table
from datalakehouse_spark.operators.dedup import lsh_candidate_pairs, near_dup_pairs

SF = "/root/testdata/sf0.001"


def test_lsh_hot_bucket_salting_keeps_recall(spark):
    """A degenerate corpus (one boilerplate text) makes every band
    bucket hold all docs -> O(n^2) pairs.  The default policy SALTS
    over-cap buckets into bounded sub-joins: every pair is still
    produced (recall == uncapped), no single join task goes quadratic.
    "drop" remains the bound-total-work escape hatch from round 3."""
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated everywhere") for i in range(100)],
        "doc_id long, text string",
    )
    full = 100 * 99 // 2
    assert lsh_candidate_pairs(docs).count() == full  # uncapped baseline
    salted = lsh_candidate_pairs(docs, max_bucket_size=10)
    assert salted.count() == full  # recall == uncapped
    assert lsh_candidate_pairs(docs, max_bucket_size=10, hot_bucket="drop").count() == 0


def test_lsh_salted_pairs_exactly_match_uncapped(spark):
    """Pair-for-pair (not just count) equality of salted vs uncapped on
    a mixed corpus: some unique docs, one boilerplate family over the
    cap — the case where a bucket splits into multiple salt groups and
    the cross-salt replication must cover every combination once."""
    rows = [(i, "shared boilerplate legal footer text here") for i in range(40)]
    rows += [(100 + i, f"unique document number {i} about topic {i % 7}") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {tuple(r) for r in lsh_candidate_pairs(docs).collect()}
    salted = {tuple(r) for r in lsh_candidate_pairs(docs, max_bucket_size=7).collect()}
    assert salted == uncapped


def test_lsh_salt_plan_is_bucket_equi_join(spark):
    """Salting must keep the bucket-equi-join shape (join keys now
    include the salt) — never a nested loop or cartesian product."""
    import io
    from contextlib import redirect_stdout

    docs = load_table(spark, SF, "documents")
    buf = io.StringIO()
    with redirect_stdout(buf):
        lsh_candidate_pairs(docs, max_bucket_size=10).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lsh_cap_keeps_normal_buckets(spark):
    docs = load_table(spark, SF, "documents")
    normal = lsh_candidate_pairs(docs).count()
    capped = lsh_candidate_pairs(docs, max_bucket_size=50).count()
    assert capped == normal  # fixture buckets are small; salting is a no-op


def test_near_dup_recall_against_exact(spark):
    """Every LSH-confirmed pair must be a genuinely similar pair (the
    verify stage guarantees precision); spot-check symmetry/ordering."""
    pairs = near_dup_pairs(load_table(spark, SF, "documents")).collect()
    assert all(p.id_a < p.id_b for p in pairs)
    assert all(0.6 <= p.jaccard <= 1.0 for p in pairs)


def test_streaming_drop_duplicates(spark, tmp_path):
    """Streaming exact dedup: dropDuplicatesWithinWatermark on the event
    id — the streaming tier of the dedup family."""
    from datalakehouse_spark.streaming.jobs import events_stream

    ev = events_stream(spark, SF)
    deduped = ev.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedupstream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedupstream").first()
    assert got.n == got.d  # no duplicate ids survive
    assert got.n == load_table(spark, SF, "events").count()  # none lost either


def test_cc_pointer_jumping_converges_on_deep_chain(spark):
    """A 3000-node path graph has propagation distance 3000 — plain
    min-label CC cannot converge in 20 rounds.  Pointer jumping (path
    doubling, default on) makes the distance shrink geometrically, so
    the chain converges well inside max_iters with NO non-convergence
    warning and one label for the whole component."""
    import warnings

    from datalakehouse_spark.operators.dedup import connected_components

    n = 3000
    nodes = spark.range(n).select(F.col("id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # warning => test failure
        cc = connected_components(nodes, pairs, id_col="id")
    labels = {r.label for r in cc.collect()}
    assert labels == {0}


def test_cc_warns_instead_of_silent_split_labels(spark):
    """Round-5 advice fix: exiting by max_iters without convergence must
    WARN (silent split labels diverge from the oracle's exact
    transitive closure)."""
    import pytest as _pytest

    from datalakehouse_spark.operators.dedup import connected_components

    n = 200
    nodes = spark.range(n).select(F.col("id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    with _pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(nodes, pairs, id_col="id", max_iters=3, pointer_jump=False)


def test_dedup_canonical_keeps_highest_quality(spark):
    """Canonical pick must be by quality (ties -> min id), and cluster
    sizes must sum to the corpus size (no doc lost or double-kept)."""
    from pyspark.sql import functions as F

    from datalakehouse_spark.io import load_table
    from datalakehouse_spark.operators.dedup import dedup_canonical, dedup_clusters
    from datalakehouse_spark.operators.textstats import quality_score

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    canon = dedup_canonical(docs).cache()
    assert canon.agg(F.sum("n_docs")).first()[0] == docs.count()
    # keep_quality is the cluster max quality, and keep_id attains it
    q = quality_score(docs).select("doc_id", "quality_score")
    joined = (
        dedup_clusters(docs)
        .join(q, "doc_id")
        .groupBy("cluster")
        .agg(F.max("quality_score").alias("max_q"))
        .join(canon, "cluster")
    )
    assert joined.where(F.col("keep_quality") != F.col("max_q")).count() == 0
    kept_q = canon.join(q, canon.keep_id == q.doc_id)
    assert kept_q.where(F.col("keep_quality") != F.col("quality_score")).count() == 0
    canon.unpersist()


def test_cc_escalation_fixes_deep_chain(spark):
    """Round-8: a chain the configured pointer-jumping budget cannot
    finish must ESCALATE to large-star/small-star and still return the
    exact transitive closure (one label per component), not split
    labels.  max_iters=2 without pointer jumping covers propagation
    distance 2 — far short of the 120-node path."""
    import pytest as _pytest

    from datalakehouse_spark.operators.dedup import connected_components

    n = 120
    nodes = spark.range(n).select(F.col("id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    with _pytest.warns(RuntimeWarning, match="escalating"):
        cc = connected_components(
            nodes, pairs, id_col="id", max_iters=2, pointer_jump=False
        )
    assert {r.label for r in cc.collect()} == {0}


def test_star_contraction_matches_union_find(spark):
    """_star_contraction vs a driver-side union-find oracle on a mixed
    graph: deep chain + cycle + star + bridge + singletons."""
    from datalakehouse_spark.operators.dedup import _star_contraction, connected_components

    edges = (
        [(i, i + 1) for i in range(0, 40)]          # chain 0..40
        + [(50, 51), (51, 52), (52, 50)]            # triangle
        + [(60, t) for t in range(61, 70)]          # star
        + [(40, 50)]                                # bridge chain->triangle
        + [(80, 80)]                                # self-loop singleton
    )
    node_ids = list(range(0, 42)) + list(range(50, 53)) + list(range(60, 70)) + [80, 99]

    parent = {v: v for v in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in node_ids}

    nodes = spark.createDataFrame([(v,) for v in node_ids], "id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    # escalation path end-to-end (budget 0 jumps straight to the stars)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)
        cc = connected_components(
            nodes, pairs, id_col="id", max_iters=1, pointer_jump=False
        )
    got = {r.id: r.label for r in cc.collect()}
    assert got == want
    # and the contraction primitive alone, on the symmetric edge frame
    sym = pairs.select(F.col("id_a").alias("s"), F.col("id_b").alias("d"))
    star = {r.nid: r.label for r in _star_contraction(sym).collect()}
    for v, lbl in star.items():
        assert lbl == want[v]


def test_semantic_dedup_salting_preserves_drop_set(spark):
    """semantic_dedup's hot-cluster guard: when one cluster holds the
    whole (degenerate) corpus, the salted sub-joins must produce the
    SAME dropped set as the uncapped within-cluster join."""
    from datalakehouse_spark.operators.dedup import _bucketed_pair_sides

    rows = spark.createDataFrame(
        [(i, 0, [float(i % 4), 1.0]) for i in range(60)],
        "vec_id long, cluster int, v array<double>",
    )

    def dropped(cap):
        left, right, jcols = _bucketed_pair_sides(
            rows, ["cluster"], "vec_id", max_bucket_size=cap, hot_bucket="salt"
        )
        a = left.select(F.col("vec_id").alias("id_a"), *jcols, F.col("v").alias("va"))
        b = right.select(F.col("vec_id").alias("id_b"), *jcols, F.col("v").alias("vb"))
        sim = F.aggregate(
            F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, d: acc + d
        )
        return {
            r.id_b
            for r in a.join(b, jcols)
            .where(F.col("id_a") < F.col("id_b"))
            .where(sim >= 2.0)
            .select("id_b")
            .distinct()
            .collect()
        }

    assert dropped(cap=7) == dropped(cap=10_000)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)), min_size=0, max_size=60
    ),
    escalated=st.booleans(),
)
@settings(max_examples=10, deadline=None)
def test_cc_random_graphs_match_union_find(spark, edges, escalated):
    """Property: on arbitrary random graphs (self-loops, parallel and
    reversed edges included) BOTH the pointer-jumping path and the
    star-contraction escalation return exactly the union-find labels."""
    from datalakehouse_spark.operators.dedup import connected_components

    node_ids = list(range(40))
    parent = {v: v for v in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in node_ids}

    nodes = spark.createDataFrame([(v,) for v in node_ids], "id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long") if edges else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore", RuntimeWarning)
        cc = connected_components(
            nodes,
            pairs,
            id_col="id",
            # max_iters=1 + no pointer jump forces the escalation path
            max_iters=1 if escalated else 20,
            pointer_jump=not escalated,
        )
    got = {r.id: r.label for r in cc.collect()}
    assert got == want
