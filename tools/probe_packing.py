"""Scale probe for the two-pass distributed cumsum in sequence_packing
(VERDICT r02 #1, r03 #4): a dominant-stratum corpus (90% one language,
plus a NULL-lang stratum) that would funnel through ONE task under the
old per-stratum unbounded window.

Generates N synthetic docs (default 1M, 90% 'en', ~2% NULL lang), runs the
packing layout both ways on identical data, and reports:
  - wall time old (single window per stratum) vs new (chunked two-pass)
  - the largest window-group size each plan sorts in one task, at the
    DERIVED chunk width (choose_pack_chunk_hex) — run with a 10x larger N
    to watch k widen and the group bound hold
  - equality of the resulting (seq_id, seq_offset) layout (must be exact —
    same md5 total order), including the NULL-lang stratum (the probe's
    join mirrors production's eqNullSafe on lang; ADVICE r03)

Usage: python tools/probe_packing.py [n_docs] [target_group_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from clj_nlp_parse_spark.queries import (PACK_TARGET_GROUP_ROWS,
                                         choose_pack_chunk_hex)
from clj_nlp_parse_spark.session import get_spark


def synth_docs(spark, n):
    # 90% en / ~8% spread over 4 langs / ~2% NULL lang; token counts 1..512
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 50 == 49, F.lit(None).cast("string"))
        .when(F.col("id") % 10 < 9, F.lit("en"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 4).cast("string")))
        .alias("lang"),
        (F.pmod(F.xxhash64("id"), F.lit(512)) + 1).cast("long")
        .alias("n_tokens"))


def pack_old(w):
    win = (Window.partitionBy("lang")
           .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = w.withColumn("cum", F.sum("n_tokens").over(win))
    start = F.col("cum") - F.col("n_tokens")
    return c.select("doc_id", "lang", "n_tokens",
                    F.floor(start / 512).cast("long").alias("seq_id"),
                    (start % 512).cast("long").alias("seq_offset"))


def pack_new(w, chunk_hex, target):
    h = F.md5(F.col("doc_id").cast("string"))
    w = w.select("*", h.alias("__h"),
                 F.substring(h, 1, chunk_hex).alias("__chunk"))
    local_win = (Window.partitionBy("lang", "__chunk")
                 .orderBy("__h", "doc_id")
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = w.withColumn("local_cum", F.sum("n_tokens").over(local_win))
    sub = w.groupBy("lang", "__chunk").agg(
        F.sum("n_tokens").alias("chunk_total"))
    off_win = (Window.partitionBy("lang").orderBy("__chunk")
               .rowsBetween(Window.unboundedPreceding, -1))
    offsets = sub.select(
        F.col("lang").alias("__olang"), F.col("__chunk").alias("__ochunk"),
        F.coalesce(F.sum("chunk_total").over(off_win), F.lit(0))
        .alias("chunk_offset"))
    # mirror production EXACTLY (queries.py q_sequence_packing): eqNullSafe
    # on lang so the NULL-lang stratum survives the offset join
    c = (c.join(F.broadcast(offsets),
                F.col("lang").eqNullSafe(F.col("__olang"))
                & (F.col("__chunk") == F.col("__ochunk")))
         .drop("__olang", "__ochunk"))
    start = F.col("chunk_offset") + F.col("local_cum") - F.col("n_tokens")
    return c.select("doc_id", "lang", "n_tokens",
                    F.floor(start / 512).cast("long").alias("seq_id"),
                    (start % 512).cast("long").alias("seq_offset"))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    target = (int(sys.argv[2]) if len(sys.argv) > 2
              else PACK_TARGET_GROUP_ROWS)
    spark = get_spark(app_name="probe_packing", parallelism=32,
                      shuffle_partitions=32)
    docs = synth_docs(spark, n).cache()
    n_null = docs.where(F.col("lang").isNull()).count()
    chunk_hex = choose_pack_chunk_hex(docs, target=target)
    print(f"n={n} null-lang rows={n_null} derived chunk_hex={chunk_hex} "
          f"(target group <= {target})")

    def run(fn, label):
        fn(docs).write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        fn(docs).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s")
        return dt

    run(pack_old, "old (per-stratum window)")
    run(lambda d: pack_new(d, chunk_hex, target), "new (chunked two-pass)")
    # largest single-task sort group under each plan
    g_old = docs.groupBy("lang").count().agg(F.max("count")).collect()[0][0]
    h = F.md5(F.col("doc_id").cast("string"))
    g_new = (docs.select("lang", F.substring(h, 1, chunk_hex).alias("c"))
             .groupBy("lang", "c").count()
             .agg(F.max("count")).collect()[0][0])
    bounded = g_new <= target
    print(f"max window-group rows: old={g_old} new={g_new} "
          f"(bound factor {g_old / g_new:.0f}x; "
          f"within target: {bounded})")
    diff = (pack_old(docs).alias("a")
            .join(pack_new(docs, chunk_hex, target).alias("b"), "doc_id")
            .where("a.seq_id != b.seq_id OR a.seq_offset != b.seq_offset")
            .count())
    n_new = pack_new(docs, chunk_hex, target).count()
    print(f"layout diff rows: {diff} (must be 0); "
          f"new-plan rows: {n_new} (must be {n})")
    spark.stop()
    sys.exit(1 if (diff or n_new != n or not bounded) else 0)


if __name__ == "__main__":
    main()
