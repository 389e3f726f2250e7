"""Scale probe for token_budget_select's histogram-threshold plan.

The spec (ORDER BY quality DESC, doc_id + running token sum <= budget) is
inherently a global total order; a naive implementation is ONE unbounded
window over the whole corpus — a single-task sort whose cost (and spill
risk) grows with the corpus. The shipped plan decides whole quality bins
from a <=100,001-row histogram and orders only the boundary bin.

This probe runs both on identical pre-scored data (quality uniform from a
hash — the web-corpus shape, every bin thinly populated) at two sizes and
reports wall times, the boundary-bin population (the only rows the shipped
plan ever sorts in one task), and output equality (must be exact).

Usage: python tools/probe_budget.py [n_docs] (second run at 4x implied)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators.curation import select_from_scored
from clj_nlp_parse_spark.session import get_spark

BINS = 100_000


def synth_scored(spark, n, const=False):
    # uniform quality in [0,1) from a hash (const=False) or one identical
    # value for EVERY doc (const=True — the single-bin degenerate where
    # the whole corpus IS the boundary bin); tokens 1..512; 3 langs
    q = (F.lit(0.5).cast("double") if const else
         (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double")
          / 1_000_000.0))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"),
        q.alias("quality"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(512)) + 1).cast("long")
        .alias("n_bpe_tokens"))


def naive_select(s, budget_num=6, budget_den=10):
    """The spec verbatim: one partition-less window over the corpus."""
    tot = s.agg(F.expr(f"(sum(n_bpe_tokens) * {budget_num}) "
                       f"div {budget_den}").alias("__b"))
    w = (Window.orderBy(F.col("quality").desc(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (s.withColumn("__cum", F.sum("n_bpe_tokens").over(w))
            .crossJoin(F.broadcast(tot))
            .where(F.col("__cum") <= F.col("__b"))
            .select("doc_id", "lang", "quality", "n_bpe_tokens"))


def run(fn, s, label):
    fn(s).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    fn(s).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.2f}s")
    return dt


def probe(spark, n, const=False):
    s = synth_scored(spark, n, const=const).cache()
    s.count()
    print(f"n={n}{' (constant quality — single-bin degenerate)' if const else ''}")
    t_new = run(lambda d: select_from_scored(d, bins=BINS), s,
                "histogram-threshold (shipped)")
    t_old = run(naive_select, s, "naive global window")
    # boundary-bin population = the only single-task sort the shipped
    # plan performs
    bmax = (s.select(F.expr(f"cast(floor(quality * {BINS}) as int)")
                     .alias("b"))
            .groupBy("b").count().agg(F.max("count")).collect()[0][0])
    a, b = select_from_scored(s, bins=BINS).alias("a"), \
        naive_select(s).alias("b")
    n_a = select_from_scored(s, bins=BINS).count()
    n_b = naive_select(s).count()
    diff = a.join(b, "doc_id", "full") \
        .where("a.quality IS NULL OR b.quality IS NULL").count()
    print(f"  max bin population={bmax}  admitted new={n_a} old={n_b} "
          f"set-diff={diff} (must be 0)  speedup={t_old / t_new:.2f}x")
    s.unpersist()
    return diff == 0 and n_a == n_b


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="probe_budget", parallelism=32,
                      shuffle_partitions=32)
    ok1 = probe(spark, n)
    ok2 = probe(spark, 4 * n)
    # degenerate: identical quality everywhere -> one bin, the boundary
    # window covers the corpus; must stay CORRECT and no worse than the
    # naive plan it collapses to
    ok3 = probe(spark, n, const=True)
    spark.stop()
    sys.exit(0 if (ok1 and ok2 and ok3) else 1)


if __name__ == "__main__":
    main()
