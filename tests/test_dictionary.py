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
    # r6: tag_mentions no longer materializes the full annotated struct;
    # the token count comes from the word array (same length)
    tagged = D.tag_mentions(df, items)
    row = tagged.select(
        "doc_id", *D.mentions_feature_cols("tok_re_mentions", "words",
                                           ["JOIN_OP"])).collect()[0]
    assert row.mentions_count_join_op == 0
    assert row.mentions_ratio_join_op == 0.0


# ---------------------------------------------------------- option parity
def test_case_min_tok_sensitive(spark):
    # tok_re.clj:126-127: >= case-min-tok tokens → case-SENSITIVE item
    items = [D.DictItem(9, "Teddy Grams", "PRODUCT", case_min_tok=2)]
    got = _tag(spark, items, "I love Teddy Grams but not teddy grams")
    assert got == [("PRODUCT", 9, 2, 4)]


def test_case_min_tok_below_threshold_insensitive(spark):
    items = [D.DictItem(9, "Teddy Grams", "PRODUCT", case_min_tok=3)]
    got = _tag(spark, items, "I love Teddy Grams but not teddy grams")
    assert got == [("PRODUCT", 9, 2, 4), ("PRODUCT", 9, 6, 8)]


def test_conj_alternation_default_on(spark):
    # tok_re.clj:39,120-122: an item token 'and'/'&' matches both symbols;
    # reference default is ON
    items = [D.DictItem(10, "rock & roll", "MUSIC")]
    assert _tag(spark, items, "play rock and roll now") == [
        ("MUSIC", 10, 1, 4)]
    items = [D.DictItem(11, "salt and pepper", "FOOD")]
    assert _tag(spark, items, "add salt and pepper") == [("FOOD", 11, 1, 4)]


def test_conj_alternation_off(spark):
    items = [D.DictItem(10, "rock & roll", "MUSIC", conj_regexp=False)]
    # '&' cannot tokenize under the engine tokenizer, so without the
    # alternation the item can never match
    assert _tag(spark, items, "play rock and roll now") == []


def test_conj_case_sensitive_interaction(spark):
    # case-sensitive item: massaged text 'and' still gets the alternation,
    # matched case-sensitively against the cased token
    items = [D.DictItem(12, "salt and pepper", "FOOD", case_min_tok=0)]
    assert _tag(spark, items, "add salt and pepper") == [("FOOD", 12, 1, 4)]
    assert _tag(spark, items, "add salt AND pepper") == []


def test_is_regexp_verbatim(spark):
    # engine contract: whitespace-separated per-token regexes, full-match,
    # case-sensitive (tok_re.clj:45-46,66 — surface syntax deviation
    # documented in the module docstring)
    items = [D.DictItem(13, "/[a-z]*ing/ scan", "ING_SCAN", is_regexp=True)]
    assert _tag(spark, items, "running scan done") == [("ING_SCAN", 13, 0, 2)]
    assert _tag(spark, items, "Running scan done") == []


def test_trailing_the_chop(spark):
    # the reference's massage-tokens passes first?=true for the LAST token
    # (tok_re.clj:141-152), so a trailing 'the' is chopped too
    items = [D.DictItem(14, "walk the", "WALK_T")]
    assert _tag(spark, items, "they walk the line") == [("WALK_T", 14, 1, 2)]


def test_chop_runs_after_lemmatization(spark):
    # single-token lemma item whose LEMMA is 'the' is chopped away entirely
    # (massage-word-map lemmatizes before the det-chop test,
    # tok_re.clj:131-139) → the item compiles to nothing
    items = [D.DictItem(15, "thes", "T", lem_min_len=0)]
    assert D.compile_items(items) == []
    assert _tag(spark, items, "thes the line") == []


def test_features_map_in_catalyst_struct(spark):
    # tok_re.clj:78-82 / ner_test.clj:46-50: mentions carry the item's
    # features map
    items = [D.DictItem(123, "teddy grams", "PRODUCT",
                        features={"food-type": "snack"})]
    df = spark.createDataFrame([(1, "I like Teddy Grams on Tuesday")],
                               "doc_id long, text string")
    tagged = D.tag_mentions(df, items, with_features=True)
    from pyspark.sql import functions as F
    row = tagged.select(F.explode("tok_re_mentions").alias("m")) \
                .select(F.expr("m.features['food-type']").alias("ft"),
                        F.expr("m.features['nope']").alias("missing")) \
                .collect()[0]
    assert row.ft == "snack"
    assert row.missing is None


def test_case_sensitive_lemma_restoration(spark):
    # cased lemma restoration (tok_re.clj:97-107): 'Dups' → 'Dup',
    # 'DUPS' → 'DUP'; item 'Dups' lem+case matches the same shapes
    assert D.cased_lemma_py("Dups") == "Dup"
    assert D.cased_lemma_py("DUPS") == "DUP"
    assert D.cased_lemma_py("dups") == "dup"
    # lemma == word ignoring case → keep the ORIGINAL word (even odd case)
    assert D.cased_lemma_py("TaBle") == "TaBle"
    items = [D.DictItem(16, "Dups", "RARE", lem_min_len=0, case_min_tok=0)]
    assert _tag(spark, items, "all the Dups here") == [("RARE", 16, 2, 3)]
    assert _tag(spark, items, "all the dups here") == []


def test_full_parser_golden_ner_test_clj(spark):
    """Mirrors ner_test.clj:28-50: mention text recovered over char ranges,
    features map and item ids surfaced, tokens-for-mention count."""
    from clj_nlp_parse_spark.functions.parse import parse_document
    items = [
        D.DictItem(123, "Teddy Grams", "PRODUCT",
                   features={"food-type": "snack"}),
        D.DictItem(5, "tuesday", "DAY_OF_WEEK"),
    ]
    pan = parse_document("I like Teddy Grams on Tuesday",
                         D.compile_items(items))
    ms = sorted(pan["tok_re_mentions"], key=lambda m: m["tok_beg"])
    product, dow = ms
    assert product["ner_tag"] == "PRODUCT"
    assert product["text"] == "Teddy Grams"
    assert product["features"] == {"food-type": "snack"}
    assert product["item_id"] == 123
    assert dow["ner_tag"] == "DAY_OF_WEEK"
    assert dow["text"] == "Tuesday"
    # tokens-for-mention over the product mention = 2 tokens
    toks = [t for s in pan["sents"] for t in s["tokens"]
            if product["tok_beg"] <= t["tok_beg"]
            and t["tok_end"] <= product["tok_end"]]
    assert len(toks) == 2


def test_unicode_length_changing_lower_falls_back(spark):
    # U+0130 'İ' lowercases to 2 code points: the cased token array cannot
    # align with the lower()-based tokenizer, so the document falls back to
    # case-INSENSITIVE matching — same rule in Catalyst, DuckDB, and the
    # Python parser (code-review finding, round 2)
    from clj_nlp_parse_spark.functions.parse import parse_document
    items = [D.DictItem(1, "Table Scan", "CS", case_min_tok=2)]
    text = "İstanbul Table Scan done"
    got = _tag(spark, items, text)
    # fallback: lowercase tokens; item pattern is cased → matches only if
    # lowercase equals the cased pattern — here it does not, so no match;
    # the lowercase twin DOES match under fallback
    assert got == []
    items_lo = [D.DictItem(2, "table scan", "CS2", case_min_tok=2)]
    got_lo = _tag(spark, items_lo, text)
    assert [(g[0], g[1]) for g in got_lo] == [("CS2", 2)]
    # the Python parser agrees (three-way contract)
    pan = parse_document(text, D.compile_items(items_lo))
    assert [m["ner_tag"] for m in pan["tok_re_mentions"]] == ["CS2"]
    pan_cs = parse_document(text, D.compile_items(items))
    assert pan_cs["tok_re_mentions"] == []


def test_mentions_sql_raises_without_needed_arrays():
    import pytest
    items = [D.DictItem(1, "Teddy Grams", "P", case_min_tok=2)]
    compiled = D.compile_items(items)
    with pytest.raises(ValueError, match="case-sensitive or regex"):
        D.mentions_sql(compiled, "words", "lemmas", "duck")
    items_lem = [D.DictItem(2, "Dups", "R", lem_min_len=0, case_min_tok=0)]
    with pytest.raises(ValueError, match="lemma"):
        D.mentions_sql(D.compile_items(items_lem), "words", "lemmas",
                       "duck", cased="cased")


def test_kelvin_sign_falls_back_in_all_three_paths(spark):
    # U+212A lowercases INTO the token class ('k'), so the ASCII cased scan
    # splits differently from lower()-then-tokenize; all three paths must
    # agree on falling back to case-insensitive matching (round-2 review)
    import duckdb
    import pandas as pd
    from clj_nlp_parse_spark import dialect
    from clj_nlp_parse_spark.functions.parse import parse_document
    text = "xKx Table rest"
    items = [D.DictItem(1, "Table", "CS", case_min_tok=0)]
    compiled = D.compile_items(items)
    # Spark
    got_spark = _tag(spark, items, text)
    # Python parser
    pan = parse_document(text, compiled)
    got_py = sorted((m["ner_tag"], m["item_id"], m["tok_beg"], m["tok_end"])
                    for m in pan["tok_re_mentions"])
    # DuckDB rendering
    con = duckdb.connect()
    con.register("documents", pd.DataFrame([(1, text)],
                                           columns=["doc_id", "text"]))
    w = dialect.tokens_expr("text", "duck")
    cw = D.cased_tokens_safe_expr("text", "words", "duck")
    lem = dialect.lemma_case_expr("t", "duck")
    m = D.mentions_sql(compiled, "words", "lemmas", "duck", cased="cased")
    drows = con.sql(
        f"WITH w0 AS (SELECT doc_id, text, {w} AS words FROM documents), "
        f"w AS (SELECT doc_id, words, {cw} AS cased FROM w0), "
        f"l AS (SELECT doc_id, words, cased, "
        f"list_transform(words, t -> ({lem})) AS lemmas FROM w) "
        f"SELECT unnest({m}) AS m FROM l").fetchall()
    got_duck = sorted((r[0]["label"], r[0]["item_id"], r[0]["tok_beg"],
                       r[0]["tok_end"]) for r in drows)
    # fallback = case-insensitive: cased item 'Table' cannot match the
    # lowercase fallback tokens → NO match, identically everywhere
    assert got_spark == got_py == got_duck == []
    # and the lowercase twin matches in all three under the same fallback
    items_lo = [D.DictItem(2, "table", "CS2", case_min_tok=0)]
    assert len(_tag(spark, items_lo, text)) == 1
    assert len(parse_document(text, D.compile_items(items_lo))
               ["tok_re_mentions"]) == 1


def test_parse_document_expanding_lower_keeps_trailing_tokens():
    # round-2 review: sentence spans must be computed on lower(text) —
    # U+0130 expansion previously truncated trailing tokens
    from clj_nlp_parse_spark.functions.parse import parse_document
    pan = parse_document("İstanbul Table Scan done")
    words = [t["text"] for s in pan["sents"] for t in s["tokens"]]
    assert words[-1] == "done"
    assert len(words) == 5  # i(combining split) stanbul table scan done
    pan2 = parse_document("İx. done deal")
    words2 = [t["text"] for s in pan2["sents"] for t in s["tokens"]]
    assert "deal" in words2 and "done" in words2
