"""Checkpoint/resume: resumed output == single-run output; manifests carry
row counts + null rates; idempotent overwrite."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from clj_nlp_parse_spark.checkpoint import CheckpointedWriter, plan_id_of


def _input(spark):
    return spark.range(100).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("bucket"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 2.0)
        .alias("val"))


def test_run_writes_manifests_with_metrics(spark, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "man")
    w = CheckpointedWriter(out, man, "bucket")
    res = w.run(_input(spark), plan_id="p1", input_snapshot="snapA")
    assert res["written_partitions"] == 5 and res["rows"] == 100
    files = sorted(os.listdir(man))
    assert len(files) == 5
    by_part = {}
    for f in files:
        m = json.load(open(os.path.join(man, f)))
        by_part[m["partition"]] = m
    assert by_part["0"]["rows"] == 20
    assert by_part["0"]["input_snapshot"] == "snapA"
    # nulls at id%10==0 all fall in bucket 0 → rate 0.5 there, 0 elsewhere
    assert abs(by_part["0"]["null_rates"]["val"] - 0.5) < 1e-9
    assert by_part["1"]["null_rates"]["val"] == 0.0


def test_resume_skips_done_and_matches_single_run(spark, tmp_path):
    df = _input(spark)
    # single run reference
    out1, man1 = str(tmp_path / "o1"), str(tmp_path / "m1")
    CheckpointedWriter(out1, man1, "bucket").run(df, "pid")
    ref = sorted(map(tuple, spark.read.parquet(out1)
                     .select("id", "bucket", "val").collect()))
    # interrupted run: only buckets 0,1 written (simulate by pre-writing)
    out2, man2 = str(tmp_path / "o2"), str(tmp_path / "m2")
    w2 = CheckpointedWriter(out2, man2, "bucket")
    w2.run(df.where(F.col("bucket").isin("0", "1")), "pid")
    assert w2.completed_partitions("pid") == {"0", "1"}
    # resume: full df, same plan id → writes only remaining 3 partitions
    res = w2.run(df, "pid")
    assert res["skipped_partitions"] == 2
    assert res["written_partitions"] == 3
    got = sorted(map(tuple, spark.read.parquet(out2)
                     .select("id", "bucket", "val").collect()))
    assert got == ref


def test_rerun_is_idempotent(spark, tmp_path):
    df = _input(spark)
    out, man = str(tmp_path / "o"), str(tmp_path / "m")
    w = CheckpointedWriter(out, man, "bucket")
    w.run(df, "pid")
    res2 = w.run(df, "pid")  # everything already done
    assert res2["written_partitions"] == 0 and res2["skipped_partitions"] == 5
    assert spark.read.parquet(out).count() == 100


def test_plan_id_stable(spark):
    a = plan_id_of(_input(spark), "snap1")
    b = plan_id_of(_input(spark), "snap1")
    c = plan_id_of(_input(spark), "snap2")
    assert a == b and a != c
