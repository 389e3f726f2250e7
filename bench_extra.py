"""Extra benchmarks for the optimization rounds (guide §1.4) — NOT the
driver's frozen bench.py.

Per-query noop-sink isolation with:
  - plan-BUILD time (fn(spark, sf_dir) — catches eager plan-build jobs)
    vs EXECUTION time (noop write) split
  - N repeats, min + median reported
  - optional .explain("formatted") capture to plans/r06/

Usage:
  python bench_extra.py [--repeats N] [--explain DIR] [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>.txt explain dumps")
    ap.add_argument("--json", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from clj_nlp_parse_spark import queries as Q
    from clj_nlp_parse_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", parallelism=CPUS,
                      shuffle_partitions=CPUS)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()  # warm

    names = args.queries or list(Q.QUERIES)
    out: dict[str, dict] = {}
    for name in names:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        builds, execs, totals = [], [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            totals.append(t2 - t0)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        rec = {
            "build_min": round(min(builds), 3),
            "exec_min": round(min(execs), 3),
            "total_min": round(min(totals), 3),
            "total_med": round(sorted(totals)[len(totals) // 2], 3),
        }
        out[name] = rec
        print(f"{name:36s} build {rec['build_min']:7.3f}  "
              f"exec {rec['exec_min']:7.3f}  total_min {rec['total_min']:7.3f}"
              f"  total_med {rec['total_med']:7.3f}", flush=True)
        spark.sparkContext.setJobDescription(None)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
