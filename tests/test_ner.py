"""A6-shaped gazetteer NER: CRF-mention mechanics (per-token typing +
same-type run merging) with hand-verified goldens, and composition with
the dictionary mention side (reference parse.clj:194-205 union shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators import dictionary as D
from clj_nlp_parse_spark.operators import ner as NER


def _mentions(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = (NER.tag_model_mentions(df)
            .select(F.explode("model_mentions").alias("x"))
            .select("x.*").collect())
    return [(r.label, r.tok_beg, r.tok_end) for r in rows]


def test_ner_run_merging_goldens(spark):
    # 'merge sort' = one 2-token OPERATION run; 'table' starts a new
    # ARTIFACT mention at the type boundary; untyped words break runs
    got = _mentions(spark, "merge sort table the scan")
    assert got == [("OPERATION", 0, 2), ("ARTIFACT", 2, 3),
                   ("OPERATION", 4, 5)]
    # adjacent same-type tokens merge across >2 tokens
    assert _mentions(spark, "join scan sort") == [("OPERATION", 0, 3)]
    # run ending at array end; leading untyped token
    assert _mentions(spark, "slow window") == [("ARTIFACT", 1, 2)]
    # no gazetteer hits / empty text → no mentions
    assert _mentions(spark, "slow big fast") == []
    assert _mentions(spark, "") == []


def test_ner_mentions_concat_with_dict_mentions(spark):
    # the model struct must be concat-compatible with the dictionary
    # mention struct (shared shape, item_id -1 marks the model side) and
    # mentions_feature_cols must consume the merged array
    items = [D.DictItem(1, "table scan", "SCAN_OP")]
    df = spark.createDataFrame(
        [(1, "the table scan runs")], "doc_id long, text string")
    tagged = NER.add_model_mentions(D.tag_mentions(df, items))
    both = tagged.withColumn(
        "all_mentions", F.expr("concat(tok_re_mentions, model_mentions)"))
    rows = (both.select(F.explode("all_mentions").alias("x"))
            .select("x.*").collect())
    got = {(r.label, r.item_id, r.tok_beg, r.tok_end) for r in rows}
    # dict: 'table scan' item; model: 'table'+'scan' merge is broken by
    # nothing between them → ARTIFACT run 'table' then OPERATION 'scan'
    assert ("SCAN_OP", 1, 1, 3) in got
    assert ("ARTIFACT", -1, 1, 2) in got
    assert ("OPERATION", -1, 2, 3) in got
    feats = both.select(
        "doc_id",
        *D.mentions_feature_cols(
            "all_mentions", "words",
            ["SCAN_OP", "ARTIFACT", "OPERATION"])).collect()[0]
    assert feats.mentions_count_scan_op == 1
    assert feats.mentions_count_artifact == 1
    assert feats.mentions_count_operation == 1
    assert feats.mentions_ratio_artifact == 0.25  # 1 mention / 4 tokens


def test_ner_gazetteer_words_disjoint_across_types():
    words = [w for ws in NER.GAZETTEER.values() for w in ws]
    assert len(words) == len(set(words)), "a word with two types is ambiguous"
