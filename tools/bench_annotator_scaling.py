"""Scaling evidence for the r4 annotator queries (VERDICT_r04 #3):
coref_chains / natlog_tokens / srl_tokens at an sf1-equivalent corpus
(10x the sf0.1 documents table), run at N=4 vs 4N=16 cores on IDENTICAL
input, reporting per-query throughput at both levels + scaling
efficiency = (T_N / T_4N) / 4.

The input is the sf0.1 documents table replicated 10x with re-keyed
doc_ids (deterministic — no new text distribution is invented), written
once to tmpfs with a fixed file count so both legs scan identical
splits (the bench_scaling.py hygiene). Each level runs in a fresh
subprocess (a JVM cannot change local[] core count in-process).

Usage: python tools/bench_annotator_scaling.py [replication]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SYNTH = r"""
import sys
sys.path.insert(0, sys.argv[4])
rep = int(sys.argv[1]); src = sys.argv[2]; path = sys.argv[3]
from pyspark.sql import functions as F
from clj_nlp_parse_spark.session import get_spark
spark = get_spark(app_name="annot-scale-synth", parallelism=16,
                  shuffle_partitions=16)
docs = spark.read.parquet(f"{src}/documents.parquet")
big = (docs.crossJoin(spark.range(rep).select(F.col("id").alias("__r")))
       .withColumn("doc_id",
                   F.col("doc_id") + F.col("__r") * F.lit(10_000_000))
       .drop("__r"))
# 64 fixed files -> both legs scan identical splits
big.repartition(64, "doc_id").write.mode("overwrite") \
   .parquet(f"{path}/documents.parquet")
spark.stop()
"""

WORKER = r"""
import json, statistics, sys, time
sys.path.insert(0, sys.argv[3])
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]
from clj_nlp_parse_spark import queries as Q
from clj_nlp_parse_spark.session import get_spark
spark = get_spark(app_name=f"annot-scale-{cpus}", parallelism=cpus,
                  shuffle_partitions=cpus)
out = {}
for name in ("coref_chains", "natlog_tokens", "srl_tokens"):
    df = Q.QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()   # warm: JIT, codegen
    n_rows = df.count()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)
    out[name] = {"rows_out": n_rows, "sec": round(dt, 3),
                 "all_sec": [round(x, 3) for x in times],
                 "rows_per_sec": round(n_rows / dt, 1)}
print(json.dumps({"cpus": cpus, "queries": out}))
spark.stop()
"""


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/dev/shm")
    path = f"{base}/spark_graft_annot_scale_{rep}x"
    if not os.path.exists(
            os.path.join(path, "documents.parquet", "_SUCCESS")):
        r = subprocess.run(
            [sys.executable, "-c", SYNTH, str(rep), src, path, REPO],
            capture_output=True, text=True, timeout=1800)
        if r.returncode != 0:
            sys.stderr.write(r.stderr)
            raise SystemExit(1)

    def run(cpus: int) -> dict:
        r = subprocess.run(
            [sys.executable, "-c", WORKER, str(cpus), path, REPO],
            capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            sys.stderr.write(r.stderr)
            raise SystemExit(1)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    lo, hi = run(4), run(16)
    report = {"replication": rep, "source_sf": src,
              "N_cores": lo, "4N_cores": hi, "per_query": {}}
    for name in lo["queries"]:
        eff = (lo["queries"][name]["sec"]
               / hi["queries"][name]["sec"]) / 4.0
        report["per_query"][name] = {
            "rows_out": lo["queries"][name]["rows_out"],
            "sec_N": lo["queries"][name]["sec"],
            "sec_4N": hi["queries"][name]["sec"],
            "rows_per_sec_N": lo["queries"][name]["rows_per_sec"],
            "rows_per_sec_4N": hi["queries"][name]["rows_per_sec"],
            "scaling_efficiency": round(eff, 3),
            "pass_ge_0.8": eff >= 0.8,
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
