#!/usr/bin/env python
"""sf1 smoke (round 14, VERDICT r13 #4): run the bucketed join/agg and
the expensive eager tier ONCE at 10x the bench scale (sf0.1 x 10 ~
sf1) and record rows/s vs sf0.1.

The fixture dir is synthesized: events/documents/embeddings via
tools/scale_smoke.synthesize(10) (shifted ids, no fake dups), plus 10x
lineitem/orders with shifted order keys (each copy is a disjoint key
range, so join selectivity and group cardinality scale the way a
bigger warehouse actually scales).  Entries run through their REGISTRY
fns — the exact plans the bench times — pointed at the synthetic dir
(all fixture state is sf_dir-tagged: bucketed tables via bucket_tag,
MV/checkpoint state likewise).

Honest metric: driving-table rows/s, which must hold or rise at 10x;
an entry that falls off gets a plan fix, not a waiver.

Usage: python tools/scale_smoke_sf1.py [mult]   (default 10)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.registry import REGISTRY, _load_extensions  # noqa: E402
from datalakehouse_spark.session import get_spark  # noqa: E402
from tools.scale_smoke import BASE_SF, synthesize  # noqa: E402

_load_extensions()

#: entry -> the table whose row count normalizes its throughput
ENTRIES = {
    "bucketed_colocated_join": "lineitem",
    "bucketed_colocated_agg": "lineitem",
    "kmeans_inertia_sweep": "embeddings",
    "pq_build_stats": "embeddings",
    "incremental_mv_maintenance": "events",
    "dup_span_coverage": "documents",
    "streaming_incremental_mv": "events",
}


def synthesize_tpch(spark, mult: int, out: str) -> None:
    """10x lineitem/orders with disjoint shifted key ranges."""
    if os.path.exists(os.path.join(out, "_TPCH_DONE")):
        return
    li = load_table(spark, BASE_SF, "lineitem")
    orders = load_table(spark, BASE_SF, "orders")
    shift = (
        orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    )  # one scalar: the key-range stride
    li_c = None
    o_c = None
    for i in range(mult):
        lc = li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * shift)
        )
        oc = orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * shift)
        )
        li_c = lc if li_c is None else li_c.unionByName(lc)
        o_c = oc if o_c is None else o_c.unionByName(oc)
    li_c.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    o_c.write.mode("overwrite").parquet(f"{out}/orders.parquet")
    open(os.path.join(out, "_TPCH_DONE"), "w").close()


def run(mult: int) -> None:
    spark = get_spark("scale_smoke_sf1")
    spark.sparkContext.setLogLevel("ERROR")
    big = synthesize(spark, mult)
    synthesize_tpch(spark, mult, big)

    counts: dict[tuple[str, str], int] = {}

    def nrows(sf, table):
        if (sf, table) not in counts:
            counts[(sf, table)] = load_table(spark, sf, table).count()
        return counts[(sf, table)]

    print(f"| entry | sf0.1 s | sf0.1 rows/s | {mult}x s | {mult}x rows/s | "
          "throughput ratio |", flush=True)
    print("|---|---|---|---|---|---|", flush=True)
    for name, table in ENTRIES.items():
        fn = REGISTRY[name].fn
        res = {}
        for sf in (BASE_SF, big):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            res[sf] = (dt, nrows(sf, table) / dt)
        ratio = res[big][1] / res[BASE_SF][1]
        print(
            f"| {name} | {res[BASE_SF][0]:.2f} | {res[BASE_SF][1]:,.0f} | "
            f"{res[big][0]:.2f} | {res[big][1]:,.0f} | {ratio:.2f}x |",
            flush=True,
        )


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
