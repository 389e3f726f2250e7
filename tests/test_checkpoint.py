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


def test_snapshot_pinned_checkpointed_materialization(spark, tmp_path):
    """End-to-end north-star loop: snapshot-pinned read → as-of feature
    materialization → checkpointed partition write whose manifests carry
    the input snapshot id. A re-run against the SAME snapshot skips every
    partition; a new table snapshot changes the plan id and recomputes —
    resumability and lineage tied together."""
    import datetime as dt

    from clj_nlp_parse_spark import checkpoint as CP
    from clj_nlp_parse_spark import sources
    from clj_nlp_parse_spark.operators import asof

    tbl = str(tmp_path / "events_tbl")
    rows1 = [(i, f"e{i % 4}",
              dt.datetime(2025, 1, 1) + dt.timedelta(minutes=i),
              float(i)) for i in range(40)]
    df1 = spark.createDataFrame(
        rows1, "event_id long, entity_id string, ts timestamp, value double")
    sid1 = sources.append_table_version(df1, tbl)

    def materialize(sid):
        snap = sources.read_table_version(spark, tbl, snapshot_id=sid)
        lefts = snap.where("event_id % 3 <> 0") \
            .select("event_id", "entity_id", F.col("ts").alias("event_ts"))
        rights = snap.where("event_id % 3 = 0").select(
            "entity_id", F.col("ts").alias("feature_ts"),
            F.col("value").alias("fval"))
        out = asof.asof_join(lefts, rights, on=["entity_id"])
        return out.withColumn("part", F.col("event_id") % 4)

    w = CP.CheckpointedWriter(str(tmp_path / "out"),
                              str(tmp_path / "manifests"), "part")
    out1 = materialize(sid1)
    pid1 = CP.plan_id_of(out1, input_snapshot=str(sid1))
    m1 = w.run(out1, pid1, input_snapshot=str(sid1))
    assert m1["written_partitions"] == 4 and m1["skipped_partitions"] == 0
    # re-run on the SAME pinned snapshot: everything skips
    m2 = w.run(materialize(sid1), pid1, input_snapshot=str(sid1))
    assert m2["written_partitions"] == 0 and m2["skipped_partitions"] == 4
    # manifests carry the lineage
    import glob
    import json
    man = json.load(open(sorted(glob.glob(
        str(tmp_path / "manifests" / "*.json")))[0]))
    assert man["input_snapshot"] == str(sid1)

    # a NEW table snapshot → new plan id → recompute (old manifests ignored)
    rows2 = [(100 + i, "e0",
              dt.datetime(2025, 1, 2) + dt.timedelta(minutes=i),
              1000.0 + i) for i in range(8)]
    sid2 = sources.append_table_version(
        spark.createDataFrame(rows2, df1.schema), tbl)
    out2 = materialize(sid2)
    pid2 = CP.plan_id_of(out2, input_snapshot=str(sid2))
    assert pid2 != pid1
    m3 = w.run(out2, pid2, input_snapshot=str(sid2))
    assert m3["written_partitions"] == 4
    # pinned v1 output unaffected by the append: still resumable/no-op
    m4 = w.run(materialize(sid1), pid1, input_snapshot=str(sid1))
    assert m4["skipped_partitions"] == 4
