"""LSH hot-bucket capping + streaming dedup (dropDuplicates w/ watermark)."""

from pyspark.sql import functions as F

from datalakehouse_spark.io import load_table
from datalakehouse_spark.operators.dedup import lsh_candidate_pairs, near_dup_pairs

SF = "/root/testdata/sf0.001"


def test_lsh_bucket_cap_bounds_pair_blowup(spark):
    """A degenerate corpus (one boilerplate text) makes every band
    bucket hold all docs -> O(n^2) pairs; the cap drops those buckets."""
    docs = spark.createDataFrame(
        [(i, "the same boilerplate text repeated everywhere") for i in range(100)],
        "doc_id long, text string",
    )
    uncapped = lsh_candidate_pairs(docs).count()
    assert uncapped == 100 * 99 // 2  # full quadratic blow-up
    capped = lsh_candidate_pairs(docs, max_bucket_size=10).count()
    assert capped == 0  # every bucket oversize -> dropped


def test_lsh_cap_keeps_normal_buckets(spark):
    docs = load_table(spark, SF, "documents")
    normal = lsh_candidate_pairs(docs).count()
    capped = lsh_candidate_pairs(docs, max_bucket_size=50).count()
    assert capped == normal  # fixture buckets are small; cap is a no-op


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
