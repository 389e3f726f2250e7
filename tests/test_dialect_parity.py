"""The three renderers of the rule tables (Spark SQL, DuckDB SQL, Python)
must agree token-for-token — the contract everything else rests on."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from clj_nlp_parse_spark import dialect

WORDS = [
    "the", "a", "cats", "cat", "running", "run", "jumped", "quickly",
    "fastest", "bigger", "famous", "beautiful", "42", "3.14", "1,000",
    "was", "been", "children", "cities", "glass", "class", "bus", "dogs",
    "it's", "don't", "x", "ab", "abc", "abcd", "stress", "address",
    "who", "whose", "how", "to", "of", "and", "there", "oh", "all",
]


def test_pos_and_lemma_three_way_parity(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "t string")
    srows = df.select(
        "t",
        F.expr(dialect.pos_case_expr("t", "spark")).alias("pos"),
        F.expr(dialect.lemma_case_expr("t", "spark")).alias("lem"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE w(t VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in WORDS])
    drows = con.execute(
        f"SELECT t, {dialect.pos_case_expr('t', 'duck')} AS pos, "
        f"{dialect.lemma_case_expr('t', 'duck')} AS lem FROM w").fetchall()
    duck = {t: (p, l) for t, p, l in drows}
    for r in srows:
        assert duck[r.t] == (r.pos, r.lem), r.t
        assert dialect.pos_py(r.t) == r.pos, r.t
        assert dialect.lemma_py(r.t) == r.lem, r.t


def test_tokens_expr_parity(spark):
    texts = ["Hello, World 42!", "it's a-b c_d", "ALL CAPS & more", ""]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    srows = {r.text: r.toks for r in df.select(
        "text", F.expr(dialect.tokens_expr("text", "spark")).alias("toks")
    ).collect()}
    con = duckdb.connect()
    for t in texts:
        got = con.execute(
            "SELECT " + dialect.tokens_expr("$1", "duck"), [t]).fetchone()[0]
        assert list(got) == list(srows[t]), t
        assert [m.group(0) for m in
                dialect.TOKEN_RE_PY.finditer(t.lower())] == list(srows[t])


def test_pos_tags_api_and_descriptions():
    # reference pos-tags / pos-tag-types / pos-description (parse.clj:89-134)
    from clj_nlp_parse_spark import schema
    assert schema.pos_tags("noun") == {"NN", "NNS", "NNP", "NNPS"}
    assert schema.pos_tags("wh") == {"WDT", "WRB", "WP", "WP$"}
    assert "CC" in schema.pos_tags() and "-LRB-" in schema.pos_tags()
    assert schema.pos_description("VBZ") == \
        "Verb, 3rd person singular present"
    assert schema.pos_description("nope") is None
    import pytest
    with pytest.raises(KeyError):
        schema.pos_tags("adjectives")
