"""Scaling-efficiency evidence for the north_rule (N → 4N cores).

Runs the flagship image+caption as-of feature materialization (plus a
caption-feature pass) at two parallelism levels on IDENTICAL input and
reports throughput at both + scaling efficiency = (T_N / T_4N) / 4.

Each level runs in a fresh subprocess (a JVM cannot change local[] core
count in-process). Usage: python tools/bench_scaling.py [n_images]
"""

from __future__ import annotations

import json
import subprocess
import sys

SYNTH = r"""
import sys
sys.path.insert(0, sys.argv[4])  # repo root, passed by the parent
n = int(sys.argv[1]); px = int(sys.argv[2]); path = sys.argv[3]
from clj_nlp_parse_spark.session import get_spark
from clj_nlp_parse_spark import synth
spark = get_spark(app_name="scale-synth", parallelism=16,
                  shuffle_partitions=16)
# 128 fixed files (~40 MB each) → both legs scan 128 identical splits
synth.synth_images(spark, n, partitions=128, min_px=px, max_px=px) \
    .write.mode("overwrite").parquet(path)
spark.stop()
"""

WORKER = r"""
import json, sys, time, statistics, os
sys.path.insert(0, sys.argv[3])  # repo root, passed by the parent
cpus = int(sys.argv[1]); path = sys.argv[2]
# Production-shaped heap: on a real cluster every executor brings its own
# memory, so the 4N leg has 4x the aggregate heap. local[] shares ONE heap
# across both legs; sizing it for the larger leg keeps the comparison about
# CPU scaling, not about GC pressure that a real cluster would not have.
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
from clj_nlp_parse_spark.session import get_spark
from clj_nlp_parse_spark.operators import asof, images
from clj_nlp_parse_spark.functions import text as tx
from pyspark.sql import functions as F

spark = get_spark(app_name=f"scale-{cpus}", parallelism=cpus,
                  shuffle_partitions=cpus)
# The input table lives ON DISK (as in production — Iceberg scan), written
# once with 128 fixed files so both levels read identical splits. Caching
# 5+ GB of image bytes in the JVM instead would overflow the storage
# fraction and re-synthesize evicted partitions mid-measurement.
imgs = spark.read.parquet(path)
n_in = imgs.count()

def job():
    feats = images.extract_image_features(imgs)
    events = imgs.select("entity_id", "event_ts")
    out = asof.asof_join(
        events, feats.select("entity_id", "feature_ts", "px_mean_r",
                             "px_mean_g", "px_mean_b", "px_std", "sharpness"),
        on=["entity_id"])
    from clj_nlp_parse_spark.functions import parse as PP
    pan = PP.parse_captions(imgs)
    pan.write.format("noop").mode("overwrite").save()
    return out.count()

n_out = job()  # warm-up: JIT, Python workers, Arrow buffers — untimed
times = []
for _ in range(5):
    t0 = time.perf_counter()
    n_out = job()
    times.append(time.perf_counter() - t0)
dt = statistics.median(times)
print(json.dumps({"cpus": cpus, "n_images": n_in, "rows_out": n_out,
                  "sec": round(dt, 3), "all_sec": [round(x, 3) for x in times],
                  "rows_per_sec": round(n_out / dt, 1)}))
spark.stop()
"""


def synth_input(n: int, px: int = 96) -> str:
    import os
    # tmpfs: the input table must be served at memory bandwidth in BOTH
    # legs. On a real cluster scan bandwidth scales with executors (each
    # brings disks/NICs); local-mode's single virtio disk is a shared
    # resource that intermittently evicts from page cache under the 4N
    # leg's memory pressure and turns runs bimodal (measured 11s-49s).
    base = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/dev/shm")
    path = f"{base}/spark_graft_scale_input_{n}_{px}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        r = subprocess.run([sys.executable, "-c", SYNTH, str(n), str(px),
                            path, _root()], capture_output=True, text=True,
                           timeout=1800, env=_env())
        if r.returncode != 0:
            sys.stderr.write(r.stderr)
            raise SystemExit(1)
    return path


def _root() -> str:
    import os
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env() -> dict:
    """Child env with the repo root on PYTHONPATH: the driver-side
    sys.path insert does NOT reach Spark's Python workers (cloudpickled
    closures import by reference there), so without this the harness only
    works when cwd happens to be the repo root."""
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = _root() + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return env


def run(cpus: int, path: str) -> dict:
    r = subprocess.run([sys.executable, "-c", WORKER, str(cpus), path,
                        _root()], capture_output=True, text=True,
                       timeout=1800, env=_env())
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    # N=4 vs 4N=16: both legs fit (JVM task threads + Python workers <= 32
    # host CPUs), mirroring a real cluster where each added executor brings
    # its own cores. local[32] would oversubscribe the host during Python
    # stages (32 tasks + 32 workers = 64 runnable on 32 CPUs) and measure
    # contention, not the engine.
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    path = synth_input(n)
    lo = run(4, path)
    hi = run(16, path)
    eff = (lo["sec"] / hi["sec"]) / 4.0
    print(json.dumps({
        "N_cores": lo, "4N_cores": hi,
        "scaling_efficiency": round(eff, 3),
        "pass_ge_0.8": eff >= 0.8,
    }, indent=1))


if __name__ == "__main__":
    main()
