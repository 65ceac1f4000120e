"""Graph scoring over document-relation graphs (e.g. the near-dup pair
graph): fixed-iteration PageRank as DataFrame ops.

Corpus-curation use: authority-style scores over a similarity/link
graph rank canonical documents and boilerplate hubs — the same signal
web-scale pipelines compute over domain link graphs.

Determinism contract: a FIXED iteration count (no convergence probe),
and the per-target contribution sum goes through DECIMAL so it is
order-independent — the DuckDB oracle replays the identical iterations
and matches bit-exactly (the double divisions are IEEE-identical; the
decimal sum removes the one order-dependent reduction).

Scale posture: per iteration one join keyed on node id + one hash
aggregate (map-side partial decimal sums) — the standard Pregel shape;
``localCheckpoint`` truncates lineage between iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal type for the order-independent contribution sum: ranks live
#: in [0.15, ~n], contributions in (0, 1]; 20 integer digits of headroom
#: and 15 fractional digits exceed double precision in this range.
_DEC = "decimal(35,15)"

#: lineage-cap cadence for the lazily-chained PageRank loop: checkpoint
#: every Nth round so plan depth stays bounded for large ``iters``.
#: Module-level (not a function local) so the cadence-equivalence test
#: can monkeypatch it directly instead of recompiling edited source
#: text (ADVICE r16).  Checkpoint cadence must never change VALUES —
#: that invariant is what tests/test_r16_optimizations.py pins.
_CKPT_EVERY = 4


def pagerank(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected pair list, ``iters`` fixed rounds.

    Each round: rank(v) = (1-damping) + damping * sum over neighbors u
    of rank(u)/degree(u).  Isolated nodes keep the base rank.  Returns
    ``(id, rank)``.
    """
    from datalakehouse_spark.materialize import materialize

    edges = materialize(
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
    )
    degree = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    base = float(1.0 - damping)
    ranks = nodes.select(F.col(id_col).alias("nid"), F.lit(1.0).alias("rank"))
    # Round 16 (guide §1.2): iterations chain LAZILY — each rank frame
    # feeds exactly the next round once, so the chained plan evaluates
    # every round exactly once in ONE job, where the previous
    # per-round eager localCheckpoint paid a full job (and its
    # scheduling latency) per iteration.  Lineage still cannot grow
    # unboundedly: a checkpoint every ``_CKPT_EVERY`` rounds (module
    # constant) caps plan depth for large ``iters`` (the 100 TB
    # many-iteration posture).
    for i in range(iters):
        contrib = (
            edges.join(ranks, edges.s == ranks.nid)
            .join(degree, "s")
            .select(F.col("d").alias("nid"), (F.col("rank") / F.col("deg")).alias("c"))
        )
        sums = contrib.groupBy("nid").agg(
            F.sum(F.col("c").cast(_DEC)).cast("double").alias("csum")
        )
        ranks = (
            nodes.select(F.col(id_col).alias("nid"))
            .join(sums, "nid", "left")
            .select(
                "nid",
                (
                    F.lit(base)
                    + F.lit(float(damping)) * F.coalesce(F.col("csum"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % _CKPT_EVERY == 0 and (i + 1) < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("nid").alias(id_col), "rank")
