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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from clj_nlp_parse_spark import queries as Q

    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from clj_nlp_parse_spark import queries as Q

    return dict(Q.ORACLES)
