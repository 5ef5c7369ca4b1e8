#!/usr/bin/env python
"""Per-query derived-scale value audit (committed round 13).

Round 12 ran the 10x/100x audits ad-hoc and learned two lessons the
hard way: (1) one shared process lets a pathological DuckDB oracle
fill /tmp and corrupt every later query, so each query gets its own
process with a capped temp dir; (2) the capstone's one-statement
oracle needs >65 GB of spill at 100x, so it runs STAGED — each
constituent materializes into a temp TABLE (bounding peak spill at
the largest constituent) before the final join.  This file makes both
lessons reproducible instead of re-derived.

Usage:
    python tests/scale_audit.py QUERY_NAME SCALED_DIR [TEMP_CAP_GB]

Prints one JSON line:
    {"query": ..., "match": bool, "rows": N, "spark_sec": ...,
     "duck_sec": ..., "staged": bool, "spill_peak_mb": ...}
and exits 0 on match, 1 on mismatch/error.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# oracles whose single-statement form outgrows the box at 100x: run
# their staged twin instead (value-equality of staged vs single form
# is pinned at oracle SF by tests/test_semantics.py)
STAGED = {"curation_pipeline_verdict"}


def _dir_size_mb(path: str) -> float:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total / 1e6


def main() -> int:
    name = sys.argv[1]
    scaled_dir = sys.argv[2]
    cap_gb = float(sys.argv[3]) if len(sys.argv) > 3 else 60.0

    # scaled-run shuffles/spills can reach tens of GB — keep them on
    # DISK, not the tmpfs scratch the engine prefers for its
    # latency-sensitive streaming state (tmpfs pages are RAM, and this
    # box has already OOM-killed one audit; sequential spill is what
    # the disk is good at)
    os.environ.setdefault("SPARK_GRAFT_SCRATCH", tempfile.gettempdir())

    import duckdb

    from bigdata_assigment3_spark import get_spark
    from bigdata_assigment3_spark.registry import REGISTRY, _load_all
    from tests.oracle_utils import compare

    _load_all()
    spec = REGISTRY[name]
    out: dict = {"query": name, "scaled_dir": scaled_dir, "staged": name in STAGED}

    spark = get_spark(f"scale-audit-{name}")
    t0 = time.perf_counter()
    sdf = spec.fn(spark, scaled_dir)
    sp = sdf.toPandas()
    out["spark_sec"] = round(time.perf_counter() - t0, 1)
    out["rows"] = len(sp)
    # The Spark result is fully collected; release the JVM heap before
    # the DuckDB phase (first 100x capstone attempt: DuckDB's default
    # 80%-of-RAM memory_limit plus a live 48g JVM = kernel OOM kill at
    # 108 GB RSS — bound BOTH sides instead of racing the box).
    spark.stop()

    spill_dir = tempfile.mkdtemp(prefix=f"bd3_audit_{name}_")
    peak = {"mb": 0.0}
    stop = threading.Event()

    def _watch() -> None:
        while not stop.is_set():
            peak["mb"] = max(peak["mb"], _dir_size_mb(spill_dir))
            time.sleep(2.0)

    watcher = threading.Thread(target=_watch, daemon=True)
    watcher.start()
    try:
        con = duckdb.connect()
        con.execute(f"SET temp_directory = '{spill_dir}'")
        con.execute(f"SET max_temp_directory_size = '{cap_gb}GB'")
        # Cap RAM too: DuckDB defaults to 80% of the box, which on a
        # 128 GB machine is an OOM-kill sentence for the quadratic
        # oracle shapes; a hard limit makes it SPILL into the metered
        # temp dir instead — the spill number is the audit's point.
        mem_gb = float(os.environ.get("BD3_AUDIT_DUCK_MEM_GB", "40"))
        con.execute(f"SET memory_limit = '{mem_gb}GB'")
        for t in TABLES:
            p = os.path.join(scaled_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        t0 = time.perf_counter()
        if name in STAGED:
            from bigdata_assigment3_spark.operators.pipeline import (
                capstone_oracle_stages,
            )

            stmts, final = capstone_oracle_stages()
            for stmt in stmts:
                con.execute(stmt)
            rel = con.sql(final)
        else:
            rel = con.sql(spec.oracle)
        # compare() consumes the relation; time includes execution
        problems = compare(_PandasAsSpark(sp), rel, name)
        out["duck_sec"] = round(time.perf_counter() - t0, 1)
    finally:
        stop.set()
        watcher.join(timeout=5)
        peak["mb"] = max(peak["mb"], _dir_size_mb(spill_dir))
        # close the connection BEFORE removing its temp dir: DuckDB's
        # destructor aborts the whole process (SIGABRT after the
        # result line) when its temp files vanish underneath it —
        # round-16 capstone runs died rc=134 in teardown this way
        try:
            con.close()
        except Exception:
            pass
        shutil.rmtree(spill_dir, ignore_errors=True)
    out["spill_peak_mb"] = round(peak["mb"], 1)
    out["match"] = not problems
    if problems:
        out["problems"] = problems[:3]
    line = json.dumps(out)
    print(line)
    # sidecar record: a 2h audit's one-line result must survive any
    # stdout-capture accident (round 14 lost the 75x metrics line to
    # exactly that; exit code 0 still proved the match, but the
    # spill/timing numbers had to be reconstructed from polling)
    with open(
        os.path.join(tempfile.gettempdir(), f"bd3_audit_result_{name}.json"), "w"
    ) as fh:
        fh.write(line + "\n")
    return 0 if not problems else 1


class _PandasAsSpark:
    """Adapter: compare() calls .toPandas() on its first arg; the Spark
    result is already collected (so Spark wall is timed separately from
    the DuckDB side)."""

    def __init__(self, pdf):
        self._pdf = pdf

    def toPandas(self):
        return self._pdf


if __name__ == "__main__":
    sys.exit(main())
