"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query on sf0.001 (smoke check).
queries()     — one entry per implemented operator from SURVEY.md §2.
oracle_sql()  — DuckDB-equivalent SQL per query (correctness gate).

All real logic lives in clj_nlp_parse_spark/; this module only adapts it to
the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: fused tokenize→POS→go-word annotation feeding the
    zero-filled POS-type feature vector (F1) over sf0.001 documents."""
    from clj_nlp_parse_spark import queries as Q

    return Q.QUERIES["pos_features"](spark, "/root/testdata/sf0.001")


def _rotated(names: list[str]) -> list[str]:
    """Registry order rotated against the LAST driver sample
    (VERDICT_r04 #5): the driver's correctness gate samples ~50 of the
    registry, so a fixed ordering leaves the same tail unsampled every
    round. Queries ABSENT from the most recent CORRECTNESS_r*.json lead
    the returned ordering (registration order preserved within each
    group), so successive driver samples cover the complement and every
    query gets driver-verified on a two-round cadence. Falls back to
    registration order when no artifact exists."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    arts = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    latest, latest_n = None, -1
    for a in arts:
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", a)
        if m and int(m.group(1)) > latest_n:
            latest, latest_n = a, int(m.group(1))
    if latest is None:
        return names
    try:
        with open(latest) as fh:
            sampled = set(json.load(fh))
    except (OSError, ValueError):
        return names
    return ([n for n in names if n not in sampled]
            + [n for n in names if n in sampled])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from clj_nlp_parse_spark import queries as Q

    return {n: Q.QUERIES[n] for n in _rotated(list(Q.QUERIES))}


def oracle_sql() -> dict[str, str]:
    from clj_nlp_parse_spark import queries as Q

    order = [n for n in _rotated(list(Q.QUERIES)) if n in Q.ORACLES]
    return {n: Q.ORACLES[n] for n in order}
