"""Optimization-round measurement harness (r12).

For each named query: capture ``.explain("formatted")`` to
``plans/r12/<query>_<tag>.txt`` and time it ISOLATED with the bench's own
methodology (one warm-up invocation, then min of N timed ``count()`` runs,
cache release between runs) plus a noop-sink timing (guide §1.4 — computes
every column, so column-pruning tricks can't hide work). Prints one JSON
line per query so runs can be diffed.

Usage:
    python tools/opt_measure.py --tag before q283_hits_scores q152_pagerank
    python tools/opt_measure.py --tag after --runs 3 q283_hits_scores
    python tools/opt_measure.py --tag probe --no-plan --all-over 1.0
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--noop", action="store_true", help="also time via noop sink")
    ap.add_argument("--out", default=None, help="JSON results file")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("mdi-opt-measure")
        .config("spark.sql.shuffle.partitions", str(max(int(args.cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    names = args.queries
    if not names:
        names = sorted(qs)
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # same warm-up as bench.py: session init + touch every input file
    spark.range(10).count()
    from manufacturing_data_integration_tool_spark.sources.readers import read_table

    for p in sorted(Path(args.sf).glob("*.parquet")):
        read_table(spark, args.sf, p.stem).count()

    def _release() -> None:
        try:
            spark.catalog.clearCache()
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
        except Exception:
            pass

    plans_dir = REPO / "plans" / "r12"
    plans_dir.mkdir(parents=True, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        _release()
        spark.sparkContext.setJobDescription(f"opt-measure: {name}")
        df = qs[name](spark, args.sf)
        if not args.no_plan:
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(buf.getvalue())
        # warm-up invocation (absorbs per-shape codegen/JIT, scratch builds)
        t0 = time.time()
        qs[name](spark, args.sf).count()
        warm = time.time() - t0
        try:
            spark.sparkContext._jvm.System.gc()
        except AttributeError:
            pass
        best = float("inf")
        for _ in range(args.runs):
            # release BEFORE every run, not just between queries: the
            # checkpoint-heavy graph family otherwise accumulates persisted
            # RDD blocks across its own repeated runs and the later runs
            # read slower than the warm-up (observed q283: warm 9.1s,
            # "best" 13.3s) — the bench's own between-query release makes
            # each in-batch timing start from a clean storage pool, so the
            # isolated harness must too.
            _release()
            t0 = time.time()
            qs[name](spark, args.sf).count()
            best = min(best, time.time() - t0)
        rec = {"count_best": round(best, 3), "warm": round(warm, 3)}
        if args.noop:
            tnoop = float("inf")
            for _ in range(args.runs):
                t0 = time.time()
                qs[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                tnoop = min(tnoop, time.time() - t0)
            rec["noop_best"] = round(tnoop, 3)
        results[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
        spark.sparkContext.setJobDescription(None)

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
