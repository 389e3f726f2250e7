"""Scale probe for passage_dedup: cost must stay LINEAR in corpus size
and must NOT blow up on the hot-key shape a web corpus actually has —
millions of verbatim copies of the same boilerplate doc, i.e. ONE passage
value owning 90% of the corpus. The Spark plan's first-occurrence scan is
a groupBy(chunk) with map-side partial aggregation, so m identical
passages collapse to one partial row per map task BEFORE the shuffle; a
window-rank formulation (the oracle's) would instead sort the hot key's m
rows in one reducer.

Runs passage_dedup at N and 4N docs under two corpus shapes — uniform
(all docs distinct) and hot (90% verbatim copies of one doc) — and
reports wall time per size/shape, the 4N/N time ratio (linear => ~<=4x
plus constant), and the hot/uniform ratio at 4N (map-side collapse =>
~1x, reducer hot-key => >>1x).

Usage: python tools/probe_passage.py [n_small]
"""

from __future__ import annotations

import os
import sys
import time
import unittest.mock as mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clj_nlp_parse_spark import queries as Q
from clj_nlp_parse_spark.session import get_spark

TOKENS_PER_DOC = 50  # 5 passages/doc at PASSAGE_K=10


def synth_docs(spark, n, hot_frac):
    """n docs of TOKENS_PER_DOC xxhash-derived words; floor(n*hot_frac)
    of them are verbatim copies of doc 0's text (the boilerplate shape).
    Fully deterministic from the row id."""
    words = (f"array_join(transform(sequence(1, {TOKENS_PER_DOC}), j -> "
             f"concat('w', cast(pmod(xxhash64(src * {TOKENS_PER_DOC} + j),"
             f" 5000) as string))), ' ')")
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(f"CASE WHEN id < {int(n * hot_frac)} THEN cast(0 as bigint) "
               f"ELSE id END").alias("src"),
        F.lit("en").alias("lang"),
    ).select("doc_id", F.expr(words).alias("text"), "lang")


def run_once(spark, n, hot_frac):
    docs = synth_docs(spark, n, hot_frac)
    with mock.patch.object(Q, "_docs", lambda _s, _d: docs):
        plan = Q.QUERIES["passage_dedup"](spark, "probe")
        t0 = time.perf_counter()
        plan.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)


def probe_incremental(spark, n_hist, n_batch,
                      state_dir="/dev/shm/passage_state"):
    """Price the increment against MATERIALIZED state (the production
    shape: prev output + per-chunk aggregate + inventory live as tables
    across increments) vs full recompute over history+batch. The
    incremental job chunk-scans ONLY the batch and broadcast-probes the
    state scans — no history text re-scan, no state shuffle — so at a
    FIXED batch size its cost must grow far slower with history than
    the full recompute's shuffle-everything plan."""
    import shutil

    docs = synth_docs(spark, n_hist + n_batch, 0.0)
    thr = n_hist - 1
    hist = docs.where(F.col("doc_id") <= thr)
    batch = docs.where(F.col("doc_id") > thr)

    # materialize state (untimed — it persists across increments)
    shutil.rmtree(state_dir, ignore_errors=True)
    hist_chunks = Q._passage_chunks(hist)
    hist_chunks.write.parquet(f"{state_dir}/inventory")
    hist_firsts = (spark.read.parquet(f"{state_dir}/inventory")
                   .groupBy("chunk")
                   .agg(F.min(F.struct("doc_id", "chunk_pos"))
                        .alias("h_first"),
                        F.count("*").alias("hn")))
    hist_firsts.write.parquet(f"{state_dir}/firsts")
    fdf = spark.read.parquet(f"{state_dir}/firsts")
    Q._passage_doc_agg(
        spark.read.parquet(f"{state_dir}/inventory").join(fdf, "chunk")
        .select("doc_id", "chunk_pos", "chunk",
                F.col("hn").alias("n_occ"),
                ((F.col("h_first.doc_id") == F.col("doc_id"))
                 & (F.col("h_first.chunk_pos") == F.col("chunk_pos")))
                .alias("is_first"))).write.parquet(f"{state_dir}/prev")

    t0 = time.perf_counter()
    Q.incremental_passage_update(
        spark.read.parquet(f"{state_dir}/prev"),
        spark.read.parquet(f"{state_dir}/firsts"),
        spark.read.parquet(f"{state_dir}/inventory"),
        Q._passage_chunks(batch),
    ).write.format("noop").mode("overwrite").save()
    t_inc = round(time.perf_counter() - t0, 3)

    with mock.patch.object(Q, "_docs", lambda _s, _d: docs):
        plan = Q.QUERIES["passage_dedup"](spark, "probe")
        t0 = time.perf_counter()
        plan.write.format("noop").mode("overwrite").save()
        t_full = round(time.perf_counter() - t0, 3)
    shutil.rmtree(state_dir, ignore_errors=True)
    print(f"incremental: hist={n_hist} batch={n_batch}  "
          f"update {t_inc:.3f} s vs full recompute {t_full:.3f} s  "
          f"({t_full / t_inc:.2f}x)", flush=True)
    return t_inc, t_full


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark(app_name="probe-passage", parallelism=8,
                      shuffle_partitions=8)
    run_once(spark, 2_000, 0.0)  # warm-up, excluded
    out = {}
    for shape, hf in (("uniform", 0.0), ("hot90", 0.9)):
        for n in (n_small, 4 * n_small):
            out[(shape, n)] = run_once(spark, n, hf)
            print(f"{shape:8s} n={n:>7d}  {out[(shape, n)]:7.3f} s",
                  flush=True)
    r_uni = out[("uniform", 4 * n_small)] / out[("uniform", n_small)]
    r_hot = out[("hot90", 4 * n_small)] / out[("hot90", n_small)]
    hot_cost = out[("hot90", 4 * n_small)] / out[("uniform", 4 * n_small)]
    print(f"4N/N ratio   uniform {r_uni:.2f}x  hot90 {r_hot:.2f}x  "
          f"(linear => ~<=4x)")
    print(f"hot90/uniform at 4N: {hot_cost:.2f}x  "
          f"(map-side collapse => ~1x)")
    # fixed 4k-doc increment against a growing history: the update's
    # wall must stay ~flat while the full recompute scales with history
    i1, f1 = probe_incremental(spark, 4 * n_small, 4_000)
    i2, f2 = probe_incremental(spark, 16 * n_small, 4_000)
    print(f"history x4 growth: update {i2 / i1:.2f}x  "
          f"full recompute {f2 / f1:.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
