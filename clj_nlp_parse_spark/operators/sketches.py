"""Deterministic mergeable sketches (custom-operator class from the round
brief: 'a novel sketch' Spark lacks).

KMV (k-minimum-values) distinct-count sketch: keep the k smallest hash
values of a column; estimate |distinct| = (k-1) * HASH_SPACE / kth_min
(Bar-Yossef et al. 2002). Unlike HyperLogLog (whose register layout differs
across engines, so approx_count_distinct can never be oracle-checked), KMV
over the engine's md5-derived h31 is BIT-DETERMINISTIC: the same rows give
the same sketch and the same estimate in Spark and DuckDB — so the oracle
gate verifies it exactly, and the estimate's accuracy is property-tested
separately.

Mergeability (the property that makes a sketch a sketch): the union's
sketch is the k smallest of the concatenated sketches — per-partition
sketches combine associatively, so Catalyst computes it as a partial+final
aggregation (tested in test_sketches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators.dedup import MINHASH_MOD, h31_sql


def kmv_min_hashes(df: DataFrame, group_cols: list[str], value_col: str,
                   k: int = 64) -> DataFrame:
    """Per-group k smallest distinct h31 hashes of value_col — the sketch.
    distinct → window top-k: two shuffles on the group key, combiner-
    friendly, no row explosion."""
    h = F.expr(h31_sql(f"cast({value_col} as string)", "spark"))
    hashed = (df.select(*group_cols, h.alias("__h"))
              .where(F.col("__h").isNotNull())
              .distinct())
    w = Window.partitionBy(*group_cols).orderBy(F.asc("__h"))
    return (hashed.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k))


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 k: int = 64) -> DataFrame:
    """Per-group KMV distinct-count estimate.

    Output: group cols + n_seen (hashes kept, = min(k, true distinct)) +
    n_est (double). When a group has < k distinct values the sketch is the
    full set and the estimate is EXACT (= n_seen)."""
    mins = kmv_min_hashes(df, group_cols, value_col, k)
    agg = (mins.groupBy(*group_cols)
           .agg(F.count("*").alias("n_seen"),
                F.max("__h").alias("__kth")))
    return agg.select(
        *group_cols,
        F.col("n_seen").cast("long").alias("n_seen"),
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise((F.lit(float(k - 1)) * F.lit(float(MINHASH_MOD)))
                   / F.col("__kth").cast("double"))
        .alias("n_est"))


def kmv_sql(group_col: str, value_col: str, k: int, d: str = "duck") -> str:
    """DuckDB rendering of the same sketch (oracle)."""
    h = h31_sql(f"CAST({value_col} AS VARCHAR)", d)
    return f"""
    WITH hashed AS (SELECT DISTINCT {group_col} AS g, {h} AS h
                    FROM events WHERE {value_col} IS NOT NULL),
    topk AS (SELECT g, h,
               row_number() OVER (PARTITION BY g ORDER BY h ASC) AS rn
             FROM hashed),
    agg AS (SELECT g, count(*) AS n_seen, max(h) AS kth
            FROM topk WHERE rn <= {k} GROUP BY g)
    SELECT g, CAST(n_seen AS BIGINT) AS n_seen,
      CASE WHEN n_seen < {k} THEN CAST(n_seen AS DOUBLE)
           ELSE ({float(k - 1)!r} * {float(MINHASH_MOD)!r})
                / CAST(kth AS DOUBLE) END AS n_est
    FROM agg"""
