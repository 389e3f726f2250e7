"""Golden tests for the fused tokenizer/tagger/lemmatizer (A1/A3/A4/A5) and
go-word filtering (F13) — mirrors the reference's golden-value unit-test
style (stopword_test.clj:22-37, SURVEY.md §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clj_nlp_parse_spark.functions import text as tx


def _ann_one(spark, s):
    df = spark.createDataFrame([(s,)], "text string")
    return tx.annotate(df).select("toks").collect()[0].toks


def test_tokenize_basic(spark):
    toks = _ann_one(spark, "Hello, World 42! THE cats are running.")
    words = [t.word for t in toks]
    assert words == ["hello", "world", "42", "the", "cats", "are", "running"]


def test_pos_tags_deterministic(spark):
    toks = _ann_one(spark, "The fast cats are running quickly to 42 rivers")
    tags = {t.word: t.pos_tag for t in toks}
    assert tags["the"] == "DT"
    assert tags["fast"] == "JJ"
    assert tags["cats"] == "NNS"
    assert tags["are"] == "VBP"
    assert tags["running"] == "VBG"
    assert tags["quickly"] == "RB"
    assert tags["to"] == "TO"
    assert tags["42"] == "CD"
    assert tags["rivers"] == "NNS"


def test_lemma_rules(spark):
    toks = _ann_one(spark, "cities running jumped cats was children")
    lem = {t.word: t.lemma for t in toks}
    assert lem["cities"] == "city"
    assert lem["running"] == "runn"  # deterministic suffix-strip contract
    assert lem["jumped"] == "jump"
    assert lem["cats"] == "cat"
    assert lem["was"] == "be"
    assert lem["children"] == "child"


def test_stopword_and_go_word(spark):
    # go-word? = NOT stopword AND pos in GO set (reference stopword.clj:33-38)
    toks = _ann_one(spark, "the cat sat on a big mat")
    by = {t.word: t for t in toks}
    assert by["the"].is_stop and not by["the"].is_go
    assert not by["cat"].is_stop and by["cat"].is_go
    assert by["on"].is_stop and not by["on"].is_go  # stop + IN tag
    assert by["big"].is_go


def test_go_word_forms_lemma_variant(spark):
    # word-form-fn alternative: lemma lowercase (stopword.clj:24-26)
    df = spark.createDataFrame([("The cats were running",)], "text string")
    ann = tx.annotate(df)
    out = ann.select(tx.go_word_forms_col("toks", "lemma").alias("f")).collect()[0].f
    assert out == ["cat", "runn"]


def test_determinism_across_parallelism(spark, sf_dir):
    # Spark analog of threadsafe_test.clj:6-21: same rows in, same rows out,
    # independent of partitioning.
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = tx.annotate(df.repartition(1)).select("doc_id", "toks")
    b = tx.annotate(df.repartition(16)).select("doc_id", "toks")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_empty_and_punct_only_edge(spark):
    # zero-fill contract (feature/lang.clj:107): empty docs get full
    # zero vectors + NONE first/last tags, no errors under ANSI mode.
    from clj_nlp_parse_spark.operators import features
    probe = spark.createDataFrame(
        [(1, ""), (2, "!!! ... ???")], "doc_id long, text string")
    rows = {r.doc_id: r for r in features.pos_tag_features(probe).collect()}
    assert rows[1].pos_first_tag == "<none>"
    assert rows[2].pos_tag_count_noun == 0 and rows[2].pos_tag_ratio_noun == 0.0
    stats = {r.doc_id: r for r in features.token_features(probe).collect()}
    assert stats[2].is_question and stats[2].token_count == 0


def test_unicode_and_degenerate_inputs_flow_through(spark):
    """Robustness: RTL text, CJK, emoji, NULLs, 10k-char token, punct-only —
    every major operator must produce a row (never throw) for every input.
    The engine tokenizer is [a-z0-9']+ over lower(), so non-Latin text
    yields zero tokens and every downstream feature zero-fills (the
    documented contract for the multilingual-corpus edge)."""
    from clj_nlp_parse_spark.functions import text as tx
    from clj_nlp_parse_spark.functions.parse import parse_document
    from clj_nlp_parse_spark.operators import dictionary as D
    from clj_nlp_parse_spark.operators.features import with_sentiment_features
    from clj_nlp_parse_spark.operators.textstats import with_text_stats
    rows = [
        (1, "مرحبا بالعالم hello world"),
        (2, "你好世界。こんにちは！"),
        (3, "🚀🚀 emoji only 🎉"),
        (4, None),
        (5, "x" * 10000),
        (6, "?!.,;:()[]{}"),
        (7, "mixed CASE Ünïcödé tökens"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = with_text_stats(with_sentiment_features(
        tx.annotate(df)), "text").collect()
    assert len(out) == len(rows)
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].words == ["hello", "world"]     # latin survives RTL mix
    assert by_id[2].words == []                     # CJK → zero tokens
    assert by_id[4].words == []                     # NULL ≡ empty
    assert by_id[6].sentiment_utterance == 0        # punct-only zero-fills
    # dictionary tagging + the full parser under the same inputs
    items = [D.DictItem(1, "hello world", "GREET")]
    tagged = {r.doc_id: r.tok_re_mentions
              for r in D.tag_mentions(df, items).collect()}
    assert [m.label for m in tagged[1]] == ["GREET"]
    assert tagged[2] == [] and tagged[4] == []
    compiled = D.compile_items(items)
    for _, text in rows:
        pan = parse_document(text or "", compiled)
        assert pan["sents"] is not None
