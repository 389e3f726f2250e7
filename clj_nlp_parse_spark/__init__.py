"""clj_nlp_parse_spark — a PySpark-native feature-engineering engine.

A from-scratch re-expression of the computations of plandes/clj-nlp-parse
(reference at /root/reference, read-only) as idiomatic PySpark: DataFrame /
Catalyst / Arrow pandas UDFs, plus the web-scale graft mandated by
BASELINE.json (as-of joins, windowed ops, dedup, similarity, image-column
plumbing) — NOT a port of the reference's Clojure/CoreNLP execution.

Public API (stable):
    from clj_nlp_parse_spark import session, schema
    from clj_nlp_parse_spark.functions import text
    from clj_nlp_parse_spark.operators import (
        features, word_count, dictionary, asof, windows,
        dedup, similarity, textstats, images,
    )
    from clj_nlp_parse_spark.plans import pipeline
"""

__version__ = "0.1.0"
