"""SRL selection logic golden tests (reference srl.clj:110-132)."""

from __future__ import annotations

from clj_nlp_parse_spark.operators import srl


def _sel(spark, rows):
    df = spark.createDataFrame(
        rows, "sent_id long, cand_id long, score double, has_label boolean, "
              "tok_count int")
    return {r.sent_id: r.cand_id
            for r in srl.select_best_candidates(df).collect()}


def test_long_sentence_top_score_wins(spark):
    got = _sel(spark, [
        (1, 10, 0.2, False, 8), (1, 11, 0.9, False, 8), (1, 12, 0.5, True, 8)])
    assert got[1] == 11  # pure score ranking, label irrelevant


def test_short_sentence_prefers_first_labeled(spark):
    # tok_count <= 3: the FIRST (candidate order) labeled candidate wins
    # even if a later/other candidate scores higher (srl.clj:115-132)
    got = _sel(spark, [
        (2, 20, 0.9, False, 3), (2, 21, 0.1, True, 3), (2, 22, 0.8, True, 3)])
    assert got[2] == 21


def test_short_sentence_no_label_falls_back_to_score(spark):
    got = _sel(spark, [
        (3, 30, 0.3, False, 2), (3, 31, 0.7, False, 2)])
    assert got[3] == 31


def test_verb_features_cascade(spark):
    from clj_nlp_parse_spark import schema
    df = spark.createDataFrame(
        [(1, "running fast today"),      # first token VBG → 'running'
         (2, "the cat was sleeping"),    # root: first verb 'was' → VBD
         (3, "table chair lamp")],       # no verb → none-label
        "doc_id long, text string")
    rows = {r.doc_id: r.elected_verb
            for r in srl.verb_features(df).collect()}
    assert rows[1] == "running"
    assert rows[2] == "was"
    assert rows[3] == schema.NONE_LABEL


def test_first_propbank_label(spark):
    df = spark.createDataFrame(
        [(1, [None, "verb.01", "verb.02"]), (2, [None, None])],
        "id long, labels array<string>")
    got = {r.id: r.first_propbank
           for r in srl.first_propbank_label(df, "id", "labels").collect()}
    assert got == {1: "verb.01", 2: None}


def test_srl_feature_cols(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1, ["a.01", None, "b.02"], ["ARG0", None, "ARG1"])],
        "id long, pb array<string>, heads array<string>")
    row = df.select("id", *srl.srl_feature_cols("pb", "heads")).collect()[0]
    assert row.srl_argument_counts == 2
    assert row.srl_propbank_id != 0  # sum of two hashes, nil → 0
