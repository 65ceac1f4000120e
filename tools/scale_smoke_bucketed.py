#!/usr/bin/env python
"""Bucketed-join ladder: the same orderkey revenue join over plain
parquet vs same-bucketed tables (operators/colocate.py), timed warm.

The bucketed plan eliminates BOTH join-side shuffles (plan-asserted in
tests/test_plans.py); this smoke measures what that is worth on the
sf0.1 fixture and how the gap moves as the fact side grows (the
lineitem side is unioned with itself k times and re-bucketed — content
duplication is fine here, the join/shuffle volume is what scales).

Usage: python tools/scale_smoke_bucketed.py [mults...]   (default 1 4)
One JSON line per (variant, mult); paste into docs/SCALING_RESULTS.md.
"""

from __future__ import annotations

import json
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from datalakehouse_spark.functions.numeric import dsum  # noqa: E402
from datalakehouse_spark.io import load_table  # noqa: E402
from datalakehouse_spark.operators.colocate import (  # noqa: E402
    ensure_bucketed_table,
)
from datalakehouse_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
N_BUCKETS = 8


def _agg(li, orders):
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "revenue"
            ),
        )
    )


def _run(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 4]
    spark = get_spark("bucketed_smoke")
    spark.sparkContext.setLogLevel("ERROR")
    # broadcast off so the comparison is SMJ-vs-SMJ (shuffle presence
    # is the variable under test, not the join strategy)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_orderpriority")
    li_base = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )

    for mult in mults:
        li = li_base
        for _ in range(mult - 1):
            li = li.unionByName(li_base)

        t_o = ensure_bucketed_table(
            spark, orders, f"smoke_bkt_orders_m{mult}", "o_orderkey", N_BUCKETS
        )
        t_l = ensure_bucketed_table(
            spark, li, f"smoke_bkt_lineitem_m{mult}", "l_orderkey", N_BUCKETS
        )
        for variant, frame in (
            ("plain", _agg(li, orders)),
            ("bucketed", _agg(t_l, t_o)),
        ):
            _run(frame)  # warm codegen/page cache
            runs = sorted(_run(frame) for _ in range(5))
            print(
                json.dumps(
                    {
                        "variant": variant,
                        "mult": mult,
                        "median_s": round(runs[2], 3),
                        "min_s": round(runs[0], 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
