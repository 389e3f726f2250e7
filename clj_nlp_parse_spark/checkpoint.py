"""Checkpoint / resume with per-partition lineage manifests (north_rule).

A feature-materialization run writes its output partitioned by a partition
column (e.g. days(event_ts) bucket or entity bucket). For each completed
partition a manifest JSON records:
  partition value, row count, per-column null rates, plan_id (a hash of the
  logical plan + input snapshot id), input snapshot, write timestamp.

Resume semantics: a re-run with the same plan_id skips partitions whose
manifests exist; remaining partitions are recomputed and written with
dynamic partition overwrite (idempotent — a partially-written partition
without a manifest is simply overwritten). Resumed output == single-run
output (tested).

On Iceberg the input snapshot is the table snapshot id pinned at read time
(`VERSION AS OF`); in the sandbox (plain parquet) it is the input path. The
manifest layer is storage-agnostic by design.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CheckpointedWriter:
    def __init__(self, output_path: str, manifest_path: str,
                 partition_col: str):
        self.output_path = output_path
        self.manifest_path = manifest_path
        self.partition_col = partition_col
        os.makedirs(manifest_path, exist_ok=True)

    # ------------------------------------------------------------- manifests
    def _manifest_file(self, plan_id: str, part) -> str:
        return os.path.join(self.manifest_path, f"{plan_id}__{part}.json")

    def completed_partitions(self, plan_id: str) -> set:
        done = set()
        prefix = f"{plan_id}__"
        for f in os.listdir(self.manifest_path):
            if f.startswith(prefix) and f.endswith(".json"):
                done.add(f[len(prefix):-5])
        return done

    # ------------------------------------------------------------------ run
    def run(self, df: DataFrame, plan_id: str,
            input_snapshot: str = "") -> dict:
        """Write all not-yet-done partitions; return run metrics."""
        spark = df.sparkSession
        done = self.completed_partitions(plan_id)
        todo = df
        if done:
            todo = df.where(
                ~F.col(self.partition_col).cast("string").isin(*done))
        # metrics per partition in ONE aggregation job (no per-partition loop)
        value_cols = [c for c in todo.columns if c != self.partition_col]
        aggs = [F.count(F.lit(1)).alias("__rows")] + [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}")
            for c in value_cols]
        stats = (todo.groupBy(F.col(self.partition_col).cast("string")
                              .alias("__part"))
                 .agg(*aggs).collect())
        if not stats:
            return {"written_partitions": 0, "skipped_partitions": len(done),
                    "rows": 0}
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (todo.write.mode("overwrite")
         .partitionBy(self.partition_col).parquet(self.output_path))
        rows_total = 0
        for r in stats:
            rows = r["__rows"]
            rows_total += rows
            manifest = {
                "partition": r["__part"],
                "partition_col": self.partition_col,
                "rows": rows,
                "null_rates": {
                    c: (r[f"__nulls_{c}"] / rows if rows else 0.0)
                    for c in value_cols},
                "plan_id": plan_id,
                "input_snapshot": input_snapshot,
                "written_at": time.time(),
            }
            # atomic-ish: write tmp then rename AFTER the partition commit
            path = self._manifest_file(plan_id, r["__part"])
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(manifest, fh)
            os.replace(tmp, path)
        return {"written_partitions": len(stats),
                "skipped_partitions": len(done), "rows": rows_total}


def plan_id_of(df: DataFrame, input_snapshot: str = "") -> str:
    """Deterministic id of the logical plan + input snapshot."""
    import hashlib
    import re
    plan = df._jdf.queryExecution().logical().toString()
    # strip per-invocation expression ids (#123) — they change on every
    # re-construction of an identical plan
    plan = re.sub(r"#\d+", "#", plan)
    return hashlib.md5((plan + "|" + input_snapshot).encode()).hexdigest()[:16]
