"""KMV distinct-count sketch: accuracy, exactness below k, mergeability."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators import sketches as SK


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(1, i % 40) for i in range(500)],
                               "g int, v int")
    r = SK.kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert r.n_seen == 40 and r.n_est == 40.0


def test_kmv_accuracy(spark):
    # 6000 distinct values, k=256 → relative error well inside 3/sqrt(k)≈19%
    df = spark.range(20000).select(
        F.lit(1).alias("g"), (F.col("id") % 6000).alias("v"))
    r = SK.kmv_distinct(df, ["g"], "v", k=256).collect()[0]
    assert r.n_seen == 256
    assert abs(r.n_est - 6000) / 6000 < 0.19, r.n_est


def test_kmv_mergeable(spark):
    # sketch(A ∪ B) == k smallest of sketch(A) ∪ sketch(B): the partial+
    # final aggregation property that makes it distributable
    k = 32
    a = spark.range(0, 3000).select(F.lit(1).alias("g"),
                                    F.col("id").alias("v"))
    b = spark.range(1500, 5000).select(F.lit(1).alias("g"),
                                       F.col("id").alias("v"))
    full = SK.kmv_min_hashes(a.unionByName(b), ["g"], "v", k=k)
    ha = {r["__h"] for r in SK.kmv_min_hashes(a, ["g"], "v", k=k)
          .select(F.col("__h")).collect()}
    hb = {r["__h"] for r in SK.kmv_min_hashes(b, ["g"], "v", k=k)
          .select(F.col("__h")).collect()}
    merged = sorted(ha | hb)[:k]
    got = sorted(r["__h"] for r in full.select(F.col("__h")).collect())
    assert got == merged
    # determinism across parallelism
    est1 = SK.kmv_distinct(a.unionByName(b).coalesce(1), ["g"], "v", k=k) \
        .collect()[0].n_est
    est2 = SK.kmv_distinct(a.unionByName(b).repartition(16), ["g"], "v",
                           k=k).collect()[0].n_est
    assert est1 == est2


def test_cm_overestimates_and_merges(spark):
    # CM never underestimates; two sketches merge by summing cells
    import random
    rnd = random.Random(2)
    vals = [f"v{rnd.randint(0, 200)}" for _ in range(4000)]
    from collections import Counter
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    sk = SK.cm_sketch(df, "v")
    items = spark.createDataFrame(
        [(k,) for k in list(truth)[:20]], "item string")
    est = {r.item: r.est for r in
           SK.cm_point_estimates(sk, items).collect()}
    for k, e in est.items():
        assert e >= truth[k], (k, e, truth[k])
    # merge: sketch(a+b) == cellwise sum of sketch(a), sketch(b)
    a, b = vals[:2000], vals[2000:]
    da = spark.createDataFrame([(v,) for v in a], "v string")
    db = spark.createDataFrame([(v,) for v in b], "v string")
    full = {(r.r, r.b): r.c for r in SK.cm_sketch(df, "v").collect()}
    sa = {(r.r, r.b): r.c for r in SK.cm_sketch(da, "v").collect()}
    sb = {(r.r, r.b): r.c for r in SK.cm_sketch(db, "v").collect()}
    merged = dict(sa)
    for k, v in sb.items():
        merged[k] = merged.get(k, 0) + v
    assert full == merged


def test_cm_absent_item_estimates_zero_or_low(spark):
    # an item never inserted must stay in the output; if any of its cells
    # is empty the estimate is exactly 0 (ADVICE r01: left join + coalesce)
    import pyspark.sql.functions as F
    from clj_nlp_parse_spark.operators import sketches as SK
    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 3, "item string")
    sk = SK.cm_sketch(df, "item")
    probes = spark.createDataFrame(
        [("a",), ("never-seen-item-xyz",)], "item string")
    got = {r.item: r.est for r in SK.cm_point_estimates(sk, probes).collect()}
    assert got["a"] == 5
    assert "never-seen-item-xyz" in got
    assert got["never-seen-item-xyz"] == 0  # d=4 rows over w=512: a cell miss
