"""Linearity probe for the LM perplexity scorer: the same document
distribution at 1x and Kx corpus size must cost ~Kx wall (scan-bounded
fit + broadcast-join scoring — no super-linear term, no skew cliff from
a hot bigram). Includes an adversarial hot-bigram shard (every doc
repeats one bigram) to show the map-side combine absorbs it.

Usage: python tools/probe_lm.py [k] [base_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators import lm as LM
from clj_nlp_parse_spark.session import get_spark


def corpus(spark, n_docs: int):
    # deterministic word-salad + a 10% hot-bigram shard
    base = (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % 10 == 0,
                           F.concat(F.lit("zz9q wwx8 " * 200)))
                    .otherwise(F.concat_ws(
                        " ",
                        *[F.md5(F.concat(F.col("id").cast("string"),
                                         F.lit(f"-{i}"))).substr(1, 6)
                          for i in range(30)])).alias("text")))
    return base


def run(spark, n_docs: int) -> float:
    df = LM.fit_score(corpus(spark, n_docs))
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark(app_name="probe_lm", parallelism=32,
                      shuffle_partitions=32)
    run(spark, 1000)  # warm-up
    t1 = run(spark, base)
    tk = run(spark, base * k)
    print(f"docs={base}: {t1} s")
    print(f"docs={base * k}: {tk} s  ratio {round(tk / t1, 2)}x "
          f"for {k}x docs (linear = {k}.0x)")
    spark.stop()


if __name__ == "__main__":
    main()
