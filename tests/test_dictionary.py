"""Dictionary NER golden tests — mirrors ner_test.clj:28-50 (exact mention
spans/labels/ids) with the engine's deterministic matching contract."""

from __future__ import annotations

from clj_nlp_parse_spark.operators import dictionary as D


def _tag(spark, items, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = D.tag_mentions(df, items).select("tok_re_mentions").collect()
    return sorted(
        [(m.label, m.item_id, m.tok_beg, m.tok_end)
         for m in rows[0].tok_re_mentions])


def test_phrase_match_spans(spark):
    items = [D.DictItem(1, "teddy grams", "PRODUCT",
                        features={"food-type": "snack"})]
    got = _tag(spark, items, "I love Teddy Grams in the morning")
    assert got == [("PRODUCT", 1, 2, 4)]


def test_first_det_chop(spark):
    # 'the line' compiles to the single token 'line' (tok_re.clj:41,136-138)
    items = [D.DictItem(3, "the line", "LINE_T")]
    assert _tag(spark, items, "walk the line now") == [("LINE_T", 3, 2, 3)]
    # and matches even without a preceding 'the'
    assert _tag(spark, items, "line up") == [("LINE_T", 3, 0, 1)]


def test_lemma_match(spark):
    # lem_min_len=0 → always lemmatize last pattern token; token 'cats'
    # lemma 'cat' matches item 'cats' (lemma 'cat')
    items = [D.DictItem(5, "cats", "ANIMAL", lem_min_len=0)]
    assert _tag(spark, items, "three cats and one cat") == [
        ("ANIMAL", 5, 1, 2), ("ANIMAL", 5, 4, 5)]


def test_overlapping_matches_all_positions(spark):
    items = [D.DictItem(7, "table table", "TT")]
    # 'table table table' → starts at 0 and 1 (all-positions contract)
    assert _tag(spark, items, "table table table") == [
        ("TT", 7, 0, 2), ("TT", 7, 1, 3)]


def test_mentions_features_zero_defaults(spark):
    items = [D.DictItem(1, "hash join", "JOIN_OP")]
    df = spark.createDataFrame([(1, "no matches here")],
                               "doc_id long, text string")
    tagged = D.tag_mentions(df, items)
    row = tagged.select(
        "doc_id", *D.mentions_feature_cols("tok_re_mentions", "toks",
                                           ["JOIN_OP"])).collect()[0]
    assert row.mentions_count_join_op == 0
    assert row.mentions_ratio_join_op == 0.0
