#!/usr/bin/env python
"""Round-7 optimization probe harness (bench.py is FROZEN for measurement).

Replicates bench.py's headline methodology exactly — same session config,
same warmup, same one-shot-then-min-of-2-warm loop, same noop sink — but:

* writes per-query one-shot AND warm seconds to a JSON file you name
  (default BENCH/r07_probe.json) so before/after comparisons don't touch
  bench.py or BENCH/BASELINE.md;
* optionally dumps `.explain("formatted")` for every query to plans/r07/
  (AFTER timing, so plan compilation doesn't pollute the one-shot number);
* accepts a query-name filter so a single operator can be iterated fast.

Usage:
  python bench_extra.py                         # full headline probe
  python bench_extra.py --plans out_suffix      # also dump plans/r07/<q>_<suffix>.txt
  python bench_extra.py --only dedup_minhash_lsh,semantic_dedup [...]
  SPARK_GRAFT_PROBE_OUT=BENCH/r07_after.json python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT = os.environ.get("SPARK_GRAFT_PROBE_OUT", "BENCH/r07_probe.json")


def main() -> None:
    sys.path.insert(0, REPO)
    import bench
    import __spark_entry__ as em

    only = None
    plans_suffix = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--only":
            only = set(args.pop(0).split(","))
        elif a == "--plans":
            plans_suffix = args.pop(0)

    names = [n for n in bench.HEADLINE if only is None or n in only]
    spark = bench._spark(CPUS, "l2f-bench-extra")
    qmap = em.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    em.queries()["tpch_q1_pricing"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings, warm = {}, {}
    total = 0.0
    for name in names:
        spark.sparkContext.setJobDescription(f"one-shot:{name}")
        t0 = time.time()
        try:
            qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception as e:
            timings[name] = f"error: {type(e).__name__}: {e}"
            continue
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        trials = []
        for i in range(2):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"warm{i}:{name}")
            t0 = time.time()
            qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            trials.append(time.time() - t0)
        warm[name] = round(min(trials), 3)
        spark.catalog.clearCache()
        if plans_suffix:
            os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
            try:
                plan = qmap[name](spark, SF_DIR)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(REPO, "plans", "r07", f"{name}_{plans_suffix}.txt"),
                    "w",
                ) as f:
                    f.write(plan)
            except Exception as e:
                pass
            spark.catalog.clearCache()

    spark.stop()
    result = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "total_oneshot": round(total, 3),
        "queries": timings,
        "queries_warm": warm,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, OUT), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"total_oneshot": result["total_oneshot"], "out": OUT}))


if __name__ == "__main__":
    main()
