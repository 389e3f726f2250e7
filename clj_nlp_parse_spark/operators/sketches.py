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


# ------------------------------------------------------------ Count-Min
CM_D = 4       # hash rows
CM_W = 512     # buckets per row


def _cm_bucket_sql(r: int, value: str, d: str, w: int = CM_W) -> str:
    """Row-r bucket of a (string) value: md5-derived hash of 'r:value'."""
    if d == "spark":
        h = h31_sql(f"concat('{r}:', {value})", "spark")
    else:
        h = h31_sql(f"'{r}:' || {value}", "duck")
    return f"({h} % {w})"


def cm_sketch(df: DataFrame, value_col: str,
              d: int = CM_D, w: int = CM_W) -> DataFrame:
    """Count-Min sketch of value_col occurrences: a (row, bucket) -> count
    table of size d*w. One explode (×d) + one hash agg — combiner-friendly;
    two sketches merge by summing counts (tested). Point estimates
    overestimate by design (collisions only ever add)."""
    structs = ", ".join(
        f"named_struct('r', {r}, 'b', "
        + _cm_bucket_sql(r, f"cast({value_col} as string)", "spark", w) + ")"
        for r in range(d))
    rows = df.select(
        F.explode(F.expr(f"array({structs})")).alias("x")
    ).select(F.col("x.r").alias("r"), F.col("x.b").alias("b"))
    return rows.groupBy("r", "b").agg(
        F.count("*").cast("long").alias("c"))


def cm_point_estimates(sketch: DataFrame, items: DataFrame,
                       item_col: str = "item",
                       d: int = CM_D, w: int = CM_W) -> DataFrame:
    """Estimate each item's count: min over rows of its (r, bucket) cell.
    Broadcast the probes (tiny) against the d*w sketch.

    Probes LEFT-join the sketch with coalesce(c, 0): a probed item whose
    (r, b) cell is absent has count 0 there, so its estimate is 0 — the
    Count-Min contract for items never inserted (an inner join would drop
    the cell and overestimate, or lose the item entirely). The SKETCH is
    the broadcast side (bounded at d*w cells; the left side of a left
    outer join cannot be broadcast), so arbitrarily many probes scale."""
    probes = items.select(
        F.col(item_col),
        F.explode(F.expr("array(" + ", ".join(
            f"named_struct('r', {r}, 'b', "
            + _cm_bucket_sql(r, f"cast({item_col} as string)", "spark", w)
            + ")" for r in range(d)) + ")")).alias("x")
    ).select(item_col, F.col("x.r").alias("r"), F.col("x.b").alias("b"))
    j = probes.join(F.broadcast(sketch), ["r", "b"], "left") \
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    return j.groupBy(item_col).agg(F.min("c").cast("long").alias("est"))


def cm_sql(value_from: str, items_from: str, item_expr: str,
           d: int = CM_D, w: int = CM_W) -> str:
    """DuckDB rendering: sketch over `value_from` (SELECT ... AS v),
    estimates for `items_from` (SELECT ... AS item)."""
    row_selects = " UNION ALL ".join(
        f"SELECT {r} AS r, "
        + _cm_bucket_sql(r, "CAST(v AS VARCHAR)", "duck", w)
        + " AS b FROM vals" for r in range(d))
    probe_selects = " UNION ALL ".join(
        f"SELECT item, {r} AS r, "
        + _cm_bucket_sql(r, "CAST(item AS VARCHAR)", "duck", w)
        + " AS b FROM items" for r in range(d))
    return f"""
    WITH vals AS ({value_from}),
    cells AS ({row_selects}),
    sketch AS (SELECT r, b, CAST(count(*) AS BIGINT) AS c
               FROM cells GROUP BY r, b),
    items AS ({items_from}),
    probes AS ({probe_selects})
    SELECT p.item AS {item_expr}, CAST(min(coalesce(s.c, 0)) AS BIGINT) AS est
    FROM probes p LEFT JOIN sketch s ON p.r = s.r AND p.b = s.b
    GROUP BY p.item"""


# ------------------------------------------------------------ Python twins
# INDEPENDENT pure-Python sketch implementations (hashlib via dedup.h31_py,
# no SQL rendering) — the third comparator beyond the Spark/DuckDB dialect
# pair, fuzz-asserted in tests/test_fuzz_parity.py. Same rationale as
# dedup.minhash_sig_py: the *_sql builders feed both engines, so only a
# rendering-free twin evidences independent specification.

from clj_nlp_parse_spark.operators.dedup import h31_py  # noqa: E402


def kmv_py(values: list, k: int = 64) -> tuple[int, float]:
    """Twin of kmv_distinct for one group: (n_seen, n_est) over the
    distinct h31 hashes of the non-null values' string forms."""
    hs = sorted({h31_py(str(v)) for v in values if v is not None})[:k]
    n_seen = len(hs)
    if n_seen < k:
        return n_seen, float(n_seen)
    return n_seen, (k - 1) * float(MINHASH_MOD) / float(hs[-1])


def cm_estimates_py(values: list, items: list,
                    d: int = CM_D, w: int = CM_W) -> dict:
    """Twin of cm_sketch + cm_point_estimates: {item: estimate} with the
    min-over-rows rule and 0 for never-inserted cells."""
    cells: dict[tuple, int] = {}
    for v in values:
        for r in range(d):
            key = (r, h31_py(f"{r}:{v}") % w)
            cells[key] = cells.get(key, 0) + 1
    return {it: min(cells.get((r, h31_py(f"{r}:{it}") % w), 0)
                    for r in range(d))
            for it in items}
