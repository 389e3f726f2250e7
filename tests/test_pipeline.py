"""Pipeline DSL tests — mirrors config_parse_test.clj:8-126 error/metadata
expectations at the engine's granularity."""

from __future__ import annotations

import pytest

from clj_nlp_parse_spark.plans.pipeline import (
    FeaturePipeline, parse_pipeline_string)


def test_parse_components_and_args():
    got = parse_pipeline_string("tokenize(en),stopword,pos-features")
    assert got == [("tokenize", ["en"]), ("stopword", []),
                   ("pos-features", [])]


def test_unknown_component_error():
    with pytest.raises(ValueError, match="No such component: nonesuch"):
        parse_pipeline_string("tokenize,nonesuch")


def test_unparsable_error_has_position():
    with pytest.raises(ValueError, match="position"):
        parse_pipeline_string("tokenize,,stopword")
    with pytest.raises(ValueError, match="position"):
        parse_pipeline_string("tok(en")


def test_end_to_end_pipeline(spark):
    df = spark.createDataFrame(
        [(1, "The fast cats are running quickly")],
        "doc_id long, text string")
    out = FeaturePipeline.from_string(
        "tokenize(en),stopword,pos-features,doc-stats").transform(df)
    row = out.collect()[0]
    assert row.pos_tag_count_noun >= 1
    assert row.token_count == 6
    assert "cat" in row.go_words or "cats" in row.go_words


def test_pipeline_order_matters():
    # stopword before tokenize → toks column missing → analysis error
    from pyspark.errors.exceptions.captured import AnalysisException
    import pyspark
    p = FeaturePipeline.from_string("stopword")
    import pytest as _pt
    from clj_nlp_parse_spark.session import get_spark
    spark = get_spark(parallelism=8)
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pt.raises(Exception):
        p.transform(df).collect()
