"""Golden tests for the word-count featurizer — engineered analog of the
reference's moby.txt golden dist {"get" 3/17, "i" 9/17, "me" 5/17}
(word_count_test.clj:33-36) with a count tie pinning the deterministic
word-asc tiebreak (SURVEY.md §7 risks)."""

from __future__ import annotations

import numpy as np
import pytest

from clj_nlp_parse_spark.operators.word_count import WordCountFeaturizer


@pytest.fixture(scope="module")
def corpus(spark):
    # go-word counts for label "x": cat=9, dog=5, bird=3, ant=3 (tie), fly=1
    txt = " ".join(["cat"] * 9 + ["dog"] * 5 + ["bird"] * 3 + ["ant"] * 3
                   + ["fly"])
    return spark.createDataFrame([(1, "x", txt), (2, "y", "cat dog dog")],
                                 "doc_id long, label string, text string")


def test_dist_top3_and_normalization(spark, corpus):
    fz = WordCountFeaturizer(words_by_label_count=3)
    model = fz.fit(corpus)
    # tie between bird(3) and ant(3): word asc → ant wins the 3rd slot
    assert model.counts["x"] == {"cat": 9, "dog": 5, "ant": 3}
    assert model.totals["x"] == 17
    d = model.dist["x"]
    assert np.allclose([d["cat"], d["dog"], d["ant"]],
                       [9 / 17, 5 / 17, 3 / 17])


def test_score_sums_probabilities(spark, corpus):
    fz = WordCountFeaturizer(words_by_label_count=3)
    model = fz.fit(corpus)
    probe = spark.createDataFrame([(10, "cat dog unknown")],
                                  "doc_id long, text string")
    row = fz.transform(probe, model).collect()[0]
    assert np.isclose(row.word_count_x, 9 / 17 + 5 / 17)
    # label y: dist = {cat:1/3, dog:2/3}; score = 1/3 + 2/3 = 1
    assert np.isclose(row.word_count_y, 1.0)
    # floor(score*100) idiom from word_count_test.clj:63-65
    assert np.floor(row.word_count_x * 100) == 82.0


def test_top_count_scores(spark, corpus):
    fz = WordCountFeaturizer(words_by_label_count=3)
    model = fz.fit(corpus)
    probe = spark.createDataFrame([(10, "cat dog unknown")],
                                  "doc_id long, text string")
    rows = fz.top_count_scores(probe, model, num_counts=1).collect()
    assert len(rows) == 1 and rows[0].label == "y"  # y scores 1.0 > x 14/17


def test_scoring_uses_all_tokens_not_just_go_words(spark, corpus):
    # label-word-count-scores maps pt/tokens UNFILTERED
    # (word_count.clj:67-77): a stopword occurrence still scores if it is
    # in the dist. Engineer a dist containing a stopword-shaped go word:
    # 'the' never enters dist (stopword), but 'cat' counts even when the
    # probe doc is otherwise stopwords.
    fz = WordCountFeaturizer(words_by_label_count=3)
    model = fz.fit(corpus)
    probe = spark.createDataFrame([(11, "the the cat")],
                                  "doc_id long, text string")
    row = fz.transform(probe, model).collect()[0]
    assert np.isclose(row.word_count_x, 9 / 17)


def test_featurizer_degenerate_corpora(spark):
    # all-stopword corpus (no go words) and empty-text corpus: fit must not
    # crash; transform degrades to the id column with zero feature columns
    from clj_nlp_parse_spark.operators.word_count import WordCountFeaturizer
    fz = WordCountFeaturizer(words_by_label_count=3, label_col="lang",
                             text_col="text")
    df = spark.createDataFrame(
        [(1, "the a of and", "x"), (2, "to of the", "y")],
        "doc_id long, text string, lang string")
    model = fz.fit(df)
    assert model.labels() == []
    out = fz.transform(df, model, id_col="doc_id")
    assert out.columns == ["doc_id"] and out.count() == 2

    empty = spark.createDataFrame([(1, "", "x")],
                                  "doc_id long, text string, lang string")
    m2 = fz.fit(empty)
    assert m2.labels() == []
    assert fz.transform(empty, m2, id_col="doc_id").count() == 1
