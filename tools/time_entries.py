#!/usr/bin/env python
"""Round-16 optimization iteration harness: time a SUBSET of registry
entries with the same methodology bench.py uses (warmup at sf0.001,
noop sink, median-of-3 / build-once single-shot), without paying the
full 247-entry fleet.  Optionally dump ``explain("formatted")`` for
each timed entry to plans/r16/<name>_<tag>.txt.

Usage:
    python tools/time_entries.py NAME [NAME...] [--plans TAG] [--runs N]
    python tools/time_entries.py --top 20          # top-N from bench_out.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from datalakehouse_spark.registry import REGISTRY, _load_extensions  # noqa: E402
from datalakehouse_spark.session import get_spark  # noqa: E402

_load_extensions()

WARMUP_DIR = "/root/testdata/sf0.001"
BUILD_ONCE = {
    "ivf_build_stats",
    "pq_build_stats",
    "bpe_vocab_train",
    "streaming_near_dup_build",
}


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cold_reset_all() -> None:
    import datalakehouse_spark.registry_ext as e1
    import datalakehouse_spark.registry_ext4 as e4
    import datalakehouse_spark.registry_ext6 as e6

    e6._BPE_CACHE.clear()
    e6._ND_STAGE_CACHE.clear()
    e1._IVF_INDEX_CACHE.clear()
    e1._COARSE_CACHE.clear()
    e1._QUERY_VEC_CACHE.clear()
    e4._PQ_INDEX_CACHE.clear()
    e4._IVFPQ_INDEX_CACHE.clear()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain to plans/<dir>/<name>_<TAG>.txt")
    ap.add_argument("--plans-dir", default="r17", help="subdirectory of plans/ for --plans dumps")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        with open(os.path.join(REPO_ROOT, "bench_out.json")) as f:
            prev = json.load(f)["queries"]
        names += [n for n, _ in sorted(prev.items(), key=lambda kv: -kv[1])[: args.top] if n not in names]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown entries: {unknown}")

    spark = get_spark("time_entries")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.no_warmup:
        for name in names:
            try:
                _run(REGISTRY[name].fn(spark, WARMUP_DIR))
            except Exception as exc:  # surface, don't hide
                print(f"WARMUP FAIL {name}: {exc}", file=sys.stderr)

    if args.plans:
        os.makedirs(os.path.join(REPO_ROOT, "plans", args.plans_dir), exist_ok=True)

    results: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time_entries: {name}")
        if name in BUILD_ONCE:
            runs = []
            for _ in range(max(1, args.runs if name != "bpe_vocab_train" else args.runs)):
                cold_reset_all()
                t0 = time.perf_counter()
                _run(REGISTRY[name].fn(spark, args.sf_dir))
                runs.append(time.perf_counter() - t0)
            runs.sort()
            results[name] = runs[len(runs) // 2]
        else:
            runs = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                _run(REGISTRY[name].fn(spark, args.sf_dir))
                runs.append(time.perf_counter() - t0)
            runs.sort()
            results[name] = runs[len(runs) // 2]
        print(f"{results[name]:8.3f}s  {name}   (runs: {', '.join(f'{r:.3f}' for r in runs)})", flush=True)
        if args.plans:
            try:
                df = REGISTRY[name].fn(spark, args.sf_dir)
                plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            except Exception:
                import contextlib
                import io as _io

                df = REGISTRY[name].fn(spark, args.sf_dir)
                buf = _io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(REPO_ROOT, "plans", args.plans_dir, f"{name}_{args.plans}.txt"), "w") as f:
                f.write(plan)
    print(json.dumps({n: round(v, 3) for n, v in results.items()}))


if __name__ == "__main__":
    main()
