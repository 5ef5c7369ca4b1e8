#!/usr/bin/env python
"""Round-16 plan/timing capture: for each named query, write
plans/r16/<name>_<tag>.txt with the formatted physical plan and print
a JSON line of min-of-N noop-sink timings plus the CPU-mode sentinel
(bench.cpu_sentinel_sec) so every A/B sample carries its own box-load
attribution.  Usage:
    python tools_r16_capture.py before|after|<tag> q1 q2 ...
Env: CAP_RUNS (default 3), SPARK_GRAFT_SF_DIR, CAP_PLANS=0 to skip
plan files (timing-only A/B passes).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import cpu_sentinel_sec  # noqa: E402
from bigdata_assigment3_spark import get_spark, query_fns  # noqa: E402

TAG = sys.argv[1]
NAMES = sys.argv[2:]
N_RUNS = int(os.environ.get("CAP_RUNS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WRITE_PLANS = os.environ.get("CAP_PLANS", "1") != "0"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r16")
os.makedirs(OUT, exist_ok=True)


def formatted_plan(df):
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main():
    spark = get_spark(f"r16-capture-{TAG}")
    fns = query_fns()
    # warmups: same as bench
    fns["features_topk"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    fns["stream_type_totals"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    cpu0 = cpu_sentinel_sec(spark)
    times = {}
    for name in NAMES:
        fn = fns[name]
        spark.sparkContext.setJobDescription(f"r16-{TAG}-{name}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        plan = formatted_plan(df)
        build_s = time.perf_counter() - t0
        if WRITE_PLANS:
            header = [
                f"# query: {name}   tag: {TAG}",
                f"# sf_dir: {SF_DIR}",
                f"# build+stream wall (one cold pass incl. plan build): {build_s:.3f}s",
                f"# spark.sql.shuffle.partitions (session): "
                f"{spark.conf.get('spark.sql.shuffle.partitions')}",
            ]
            for k in ("bd3.stream_bitmap_overlap.n_batches",
                      "bd3.stream_bitmap_overlap.n_updates",
                      "bd3.stream_late_drop.dropped"):
                try:
                    header.append(f"# {k} = {spark.conf.get(k)}")
                except Exception:
                    pass
            with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as fh:
                fh.write("\n".join(header) + "\n\n" + plan)
        ts = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        times[name] = {
            "min": round(min(ts), 3),
            "times": [round(t, 3) for t in ts],
        }
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "tag": TAG,
        "times": times,
        "cpu_sentinel_start": cpu0,
        "cpu_sentinel_end": cpu_sentinel_sec(spark),
    }))


if __name__ == "__main__":
    main()
