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

import sys
import time
import unittest.mock as mock

sys.path.insert(0, "/root/repo")

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
    spark.stop()


if __name__ == "__main__":
    main()
