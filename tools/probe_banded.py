"""Scale probe for the banded cosine near-dup operator: candidate volume
must stay LINEAR in corpus size because planes-per-band is derived from N
(choose_planes_per_band keeps expected random-collision occupancy at a
constant), while recall on injected near-dups holds the
choose_cosine_bands floor.

Runs the operator at N and 4N deterministic synthetic vectors (xxhash
uniform, 64-dim) with ~N/100 injected near-duplicates, and reports per
size: derived (r, b), candidate-pair count, wall time, and recall.

Usage: python tools/probe_banded.py [n_small]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators import similarity as SIM
from clj_nlp_parse_spark.session import get_spark


def synth_vectors(spark, n, dim=64):
    # uniform in [-1, 1) per dim, fully deterministic from the row id
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(f"transform(sequence(1, {dim}), j -> "
               f"cast(pmod(xxhash64(id * {dim} + j), 2000) as double) "
               f"/ 1000.0 - 1.0)").alias("embedding"))
    # near-dups: every 100th vector re-keyed with one dim nudged by 1e-3
    dups = (base.where(F.col("vec_id") % 100 == 0)
            .select((F.col("vec_id") + 1_000_000_000).alias("vec_id"),
                    F.expr("transform(embedding, (x, i) -> "
                           "CASE WHEN i = 0 THEN x + 0.001 ELSE x END)")
                    .alias("embedding")))
    return base.unionByName(dups), n // 100 + (1 if n % 100 else 0)


def run(spark, n):
    vecs, n_true = synth_vectors(spark, n)
    vecs = vecs.cache()
    total = vecs.count()
    r = SIM.choose_planes_per_band(total)
    b = SIM.choose_cosine_bands(0.99, r)
    # candidate count BEFORE exact verify (the volume the derivation bounds)
    exprs = SIM.band_bucket_exprs("embedding", 64, b, r)
    band_structs = ", ".join(
        f"named_struct('band', {i}, 'bh', ({e}))"
        for i, e in enumerate(exprs))
    buckets = vecs.select(
        "vec_id", F.explode(F.expr(f"array({band_structs})")).alias("x")
    ).select("vec_id", "x.band", F.col("x.bh").alias("bh"))
    a, c = buckets.alias("a"), buckets.alias("c")
    n_cand = (a.join(c, (F.col("a.band") == F.col("c.band"))
                    & (F.col("a.bh") == F.col("c.bh"))
                    & (F.col("a.vec_id") < F.col("c.vec_id")))
              .select("a.vec_id", "c.vec_id").distinct().count())
    t0 = time.perf_counter()
    pairs = SIM.cosine_dedup_pairs_banded(
        vecs, threshold=0.99, dim=64, n_vectors=total)
    found = pairs.where(
        (F.col("id_b") - F.col("id_a")) == 1_000_000_000).count()
    dt = time.perf_counter() - t0
    vecs.unpersist()
    return {"n": total, "r": r, "b": b, "candidates": n_cand,
            "sec": round(dt, 2), "true_pairs": n_true,
            "found_pairs": found,
            "recall": round(found / n_true, 4)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="probe_banded", parallelism=32,
                      shuffle_partitions=32)
    lo = run(spark, n)
    hi = run(spark, 4 * n)
    growth = hi["candidates"] / max(lo["candidates"], 1)
    print(f"N={lo['n']}: r={lo['r']} b={lo['b']} "
          f"candidates={lo['candidates']} wall={lo['sec']}s "
          f"recall={lo['recall']}")
    print(f"N={hi['n']}: r={hi['r']} b={hi['b']} "
          f"candidates={hi['candidates']} wall={hi['sec']}s "
          f"recall={hi['recall']}")
    print(f"candidate growth at 4x N: {growth:.1f}x "
          f"(linear=4.0, quadratic=16.0)")
    ok = (growth < 8.0 and lo["recall"] >= 0.95 and hi["recall"] >= 0.95)
    print(f"pass: {ok}")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
