"""Per-query timing + plan capture harness for the optimization rounds.

Usage:
    python tools/qtime.py NAME [NAME ...] [--tag before|after] [--reps 3]
        [--sf /root/testdata/sf0.1] [--plan] [--noop]

Methodology mirrors bench.py exactly (warm at sf0.001, untimed warm at
the target sf, min of --reps timed .count() actions) so numbers are
comparable with BENCH_DETAIL.json. --noop additionally times the
noop-sink action (guide §1.4) which computes every column. --plan dumps
.explain("formatted") to plans/r14/<name>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plan", action="store_true")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--conf", action="append", default=[],
                    help="extra k=v session confs (A/B experiments)")
    args = ap.parse_args()

    from big_data_hw_23_24_spark.queries import _ensure_loaded, _REGISTRY
    from big_data_hw_23_24_spark.session import get_session

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_session("qtime", extra_confs=extra or None)
    _ensure_loaded()
    out = {}
    for name in args.names:
        fn = _REGISTRY[name].spark_fn
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, "/root/testdata/sf0.001").count()
        fn(spark, args.sf).count()
        gc.collect()
        runs, noops = [], []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            fn(spark, args.sf).count()
            runs.append(time.perf_counter() - t0)
            if args.noop:
                t0 = time.perf_counter()
                (fn(spark, args.sf).write.format("noop")
                 .mode("overwrite").save())
                noops.append(time.perf_counter() - t0)
        # structural metric: jobs per run (driver round-trips — the
        # thing the lazy-checkpoint work removes), counted via a job
        # group around one extra run
        spark.sparkContext.setJobGroup(f"jc:{name}", name)
        fn(spark, args.sf).count()
        n_jobs = len(spark.sparkContext.statusTracker()
                     .getJobIdsForGroup(f"jc:{name}"))
        spark.sparkContext.setJobGroup(None, None)
        rec = {"min": round(min(runs), 3),
               "med": round(sorted(runs)[len(runs) // 2], 3),
               "jobs": n_jobs}
        if noops:
            rec["noop_min"] = round(min(noops), 3)
        out[name] = rec
        if args.plan:
            plan_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r15")
            os.makedirs(plan_dir, exist_ok=True)
            tag = args.tag or "probe"
            path = f"{plan_dir}/{name}_{tag}.txt"
            df = fn(spark, args.sf)
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({name: rec}), flush=True)
    print("TOTAL", json.dumps(out))


if __name__ == "__main__":
    main()
