#!/usr/bin/env python
"""Round-15 plan/timing capture: for each named query, write
plans/r15/<name>_<tag>.txt with the formatted physical plan (plus
streaming state-operator metrics for streaming queries) and print a
JSON line of min-of-N noop-sink timings.  Usage:
    python tools_r15_capture.py before|after q1 q2 ...
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_assigment3_spark import get_spark, query_fns  # noqa: E402

TAG = sys.argv[1]
NAMES = sys.argv[2:]
N_RUNS = int(os.environ.get("CAP_RUNS", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r15")
os.makedirs(OUT, exist_ok=True)


def formatted_plan(df):
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


def main():
    spark = get_spark(f"r15-capture-{TAG}")
    fns = query_fns()
    # warmups: same as bench
    fns["features_topk"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    fns["stream_type_totals"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    times = {}
    for name in NAMES:
        fn = fns[name]
        spark.sparkContext.setJobDescription(f"r15-{TAG}-{name}")
        # plan capture (this also runs any eager/streaming part once)
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        plan = formatted_plan(df)
        build_s = time.perf_counter() - t0
        # streaming evidence: recent progress of terminated queries is
        # not retained; instead re-read the conf metrics the streaming
        # queries publish + note shuffle partitions conf
        header = [
            f"# query: {name}   tag: {TAG}",
            f"# sf_dir: {SF_DIR}",
            f"# build+stream wall (one cold pass incl. plan build): {build_s:.3f}s",
            f"# spark.sql.shuffle.partitions (session): "
            f"{spark.conf.get('spark.sql.shuffle.partitions')}",
        ]
        for k in sorted(
            [c for c in ("bd3.stream_bitmap_overlap.n_batches",
                         "bd3.stream_bitmap_overlap.n_updates",
                         "bd3.stream_late_drop.dropped")]
        ):
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
    print(json.dumps({"tag": TAG, "times": times}))


if __name__ == "__main__":
    main()
