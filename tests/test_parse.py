"""Full panon parser tests — the nested data model of SURVEY.md §1,
golden-value style mirroring doc/example-parse.md expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from clj_nlp_parse_spark.functions import parse as P
from clj_nlp_parse_spark.operators.dictionary import DictItem

TEXT = "I love Teddy Grams. Do you like snacks? The service was bad!"
ITEMS = [DictItem(123, "Teddy Grams", "PRODUCT",
                  features={"food-type": "snack"})]


def _panon(spark, text=TEXT, items=ITEMS):
    df = spark.createDataFrame([("d1", text)], "image_id string, caption string")
    return P.parse_captions(df, items).collect()[0].panon


def test_sentence_split_and_indices(spark):
    p = _panon(spark)
    assert len(p.sents) == 3
    assert [s.sent_index for s in p.sents] == [0, 1, 2]
    assert p.sents[1].text.strip() == "Do you like snacks?"


def test_token_ranges(spark):
    p = _panon(spark)
    toks = [t for s in p.sents for t in s.tokens]
    # char ranges recover the original text
    for t in toks:
        assert TEXT[t.char_beg:t.char_end].lower() == t.text.lower()
    # utterance-level token ranges are consecutive [i, i+1)
    assert [t.tok_beg for t in toks] == list(range(len(toks)))
    # sentence-level token_index restarts at 1
    assert p.sents[1].tokens[0].token_index == 1


def test_mention_text_recovered_by_substring(spark):
    p = _panon(spark)
    ms = p.tok_re_mentions
    assert len(ms) == 1
    m = ms[0]
    assert m.text == "Teddy Grams"          # original case, via char range
    assert m.entity_type == "PRODUCT" and m.item_id == 123
    assert dict(m.features) == {"food-type": "snack"}
    assert (m.tok_beg, m.tok_end) == (2, 4)
    assert m.sent_index == 0


def test_sentiment_aggregate_is_sum(spark):
    # sent1: 'love' +1 → 1; sent2: 'like' +1 → 1; sent3: 'bad' -1 → -1
    p = _panon(spark)
    assert [s.sentiment for s in p.sents] == [1, 1, -1]
    assert p.sentiment == 1  # sum over sentences (stanford.clj:474-475)


def test_panon_query_operators(spark):
    df = spark.createDataFrame([("d1", TEXT)],
                               "image_id string, caption string")
    pan = P.parse_captions(df, ITEMS)
    row = pan.select(
        P.tokens_col("panon").alias("toks"),
        P.token_at("panon", 0).alias("t0"),
        P.mentions_for_token("panon", 3).alias("m3"),
        P.token_mentions("panon").alias("tm"),
        P.sentiment_label(F.col("panon.sentiment")).alias("lab"),
    ).collect()[0]
    assert row.t0.text == "I"
    assert len(row.toks) == 12
    assert len(row.m3) == 1 and row.m3[0].entity_type == "PRODUCT"
    assert len(row.tm) == 1 and [t.text for t in row.tm[0].tokens] == \
        ["Teddy", "Grams"]
    assert row.lab == "positive"


def test_tokens_for_mention_guard(spark):
    df = spark.createDataFrame([("d1", TEXT)],
                               "image_id string, caption string")
    pan = P.parse_captions(df, ITEMS)
    row = pan.select(
        P.tokens_for_mention(
            "panon", "try_element_at(panon.tok_re_mentions, 1)")
        .alias("mt")).collect()[0]
    assert [t.text for t in row.mt] == ["Teddy", "Grams"]


def test_parser_matches_catalyst_tokens(spark, sf_dir):
    """Parity: the fused Python parser's (word, pos, lemma) must equal the
    Catalyst rule-table path on real data — one rule table, two renderers."""
    from clj_nlp_parse_spark.functions import text as tx
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100) \
        .withColumnRenamed("doc_id", "image_id") \
        .withColumnRenamed("text", "caption")
    pan = P.parse_captions(docs)
    py_side = pan.select(
        "image_id",
        F.expr("transform(flatten(transform(panon.sents, s -> s.tokens)), "
               "t -> named_struct('w', lower(t.text), 'p', t.pos_tag, "
               "'l', t.lemma))").alias("a")).collect()
    cat = tx.annotate(docs.withColumnRenamed("caption", "text"))
    cat_side = cat.select(
        "image_id",
        F.expr("transform(toks, x -> named_struct('w', x.word, 'p', "
               "x.pos_tag, 'l', x.lemma))").alias("a")).collect()
    pmap = {r.image_id: r.a for r in py_side}
    cmap = {r.image_id: r.a for r in cat_side}
    assert pmap == cmap


def test_parse_timeout_raise_and_null(spark):
    # P6 timeout contract (parse.clj:143-150, timeout_test.clj:8-17):
    # an absurdly small budget must trip on a large doc.
    big = "word " * 20000
    df = spark.createDataFrame([("d1", big)],
                               "image_id string, caption string")
    import pytest as _pt
    with _pt.raises(Exception, match="exceeded"):
        P.parse_captions(df, timeout_s=1e-9).collect()
    out = P.parse_captions(df, timeout_s=1e-9, on_timeout="null").collect()
    assert out[0].panon is None
    ok = P.parse_captions(df, timeout_s=60.0).collect()
    assert ok[0].panon is not None


def test_parse_timeout_preempts_mid_parse():
    # VERDICT r01 'wrong' #1: the deadline must ABORT a runaway parse, not
    # measure it after the fact. A document whose full parse takes T must
    # abort in a small fraction of T under a tiny budget.
    import time

    import pytest as _pytest

    from clj_nlp_parse_spark.functions import parse as P

    big = ("scan fast table join merge sort. " * 40) * 800  # ~190k tokens
    t0 = time.perf_counter()
    P.parse_document(big)
    full = time.perf_counter() - t0
    t0 = time.perf_counter()
    with _pytest.raises(P.ParseTimeout):
        P.parse_document(big, deadline=time.perf_counter() + 0.01)
    aborted = time.perf_counter() - t0
    assert aborted < max(full / 4, 0.1), (full, aborted)


def test_range_predicates_reference_goldens():
    # mirrors range_test.clj:6-23 case-for-case (inclusive semantics)
    from clj_nlp_parse_spark.functions.parse import in_range, overlap
    assert in_range(1, 5, 2, 3)
    assert in_range(1, 5, 1, 5)
    assert in_range(1, 5, 1, 3)
    assert in_range(1, 5, 2, 5)
    assert not in_range(1, 5, 0, 3)
    assert not in_range(1, 5, 2, 6)
    assert overlap(0, 5, 3, 9)
    assert overlap(3, 9, 0, 5)
    assert overlap(0, 5, 5, 9)     # endpoints touch → inclusive overlap
    assert overlap(5, 9, 0, 5)
    assert overlap(1, 5, 1, 5)
    assert not overlap(0, 5, 6, 9)
    assert not overlap(6, 9, 0, 5)


def test_range_predicates_as_column_exprs(spark):
    from pyspark.sql import functions as F2

    from clj_nlp_parse_spark.functions.parse import in_range, overlap
    df = spark.createDataFrame([(0, 5, 5, 9), (0, 5, 6, 9)],
                               "ab long, ae long, bb long, be long")
    got = [r.o for r in df.select(
        overlap(F2.col("ab"), F2.col("ae"),
                F2.col("bb"), F2.col("be")).alias("o")).collect()]
    assert got == [True, False]
    got2 = [r.i for r in df.select(
        in_range(F2.col("ab"), F2.col("be"),
                 F2.col("bb"), F2.col("ae")).alias("i")).collect()]
    assert got2 == [True, True]
