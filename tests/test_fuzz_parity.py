"""Randomized differential testing: the three renderers of the dialect rule
tables (Spark SQL, DuckDB SQL, Python) and the document-level query
fragments must agree on ADVERSARIAL inputs — random unicode-ish tokens,
empty/punct-only documents, giant words, quote pathologies."""

from __future__ import annotations

import random
import string

import duckdb
from pyspark.sql import functions as F

from clj_nlp_parse_spark import dialect


def _random_tokens(n: int, seed: int = 123) -> list[str]:
    rnd = random.Random(seed)
    alphabet = string.ascii_lowercase + "0123456789'"
    suffixes = ["", "s", "es", "ies", "ing", "ed", "ss", "us", "sses", "'s"]
    out = []
    for _ in range(n):
        base = "".join(rnd.choice(alphabet)
                       for _ in range(rnd.randint(1, 12)))
        out.append(base + rnd.choice(suffixes))
    # deliberate pathologies
    out += ["", "'", "''", "s", "ss", "sss", "ies", "ing", "ed",
            "a" * 100, "0" * 20, "'''quoted'''", "it''s"]
    return sorted(set(out))


def test_pos_lemma_fuzz_three_way(spark):
    words = _random_tokens(300)
    df = spark.createDataFrame([(w,) for w in words], "t string")
    srows = df.select(
        "t",
        F.expr(dialect.pos_case_expr("t", "spark")).alias("pos"),
        F.expr(dialect.lemma_case_expr("t", "spark")).alias("lem"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE w(t VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    duck = {t: (p, l) for t, p, l in con.execute(
        f"SELECT t, {dialect.pos_case_expr('t', 'duck')}, "
        f"{dialect.lemma_case_expr('t', 'duck')} FROM w").fetchall()}
    for r in srows:
        assert duck[r.t] == (r.pos, r.lem), repr(r.t)
        assert dialect.pos_py(r.t) == r.pos, repr(r.t)
        assert dialect.lemma_py(r.t) == r.lem, repr(r.t)


def test_doc_query_fragments_on_degenerate_docs(spark, monkeypatch):
    """Empty, punctuation-only, question-only, and huge-token documents must
    flow through every doc-level query with Spark == DuckDB."""
    import numpy as np
    import pandas as pd
    from clj_nlp_parse_spark import queries as Q

    docs = [
        (1, "", "en"),
        (2, "?!... ---", "en"),
        (3, "ok?", "en"),
        (4, ("z" * 80 + " ") * 3, "xx"),
        (5, "the the the. and? AND!", "en"),
        (6, "it's don't o'clock 'quoted'", "en"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    monkeypatch.setattr(Q, "_docs", lambda _s, _d: sdf)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        docs, columns=["doc_id", "text", "lang"]))

    for name in ["pos_features", "doc_stats", "sentiment_features",
                 "tree_features", "go_words", "token_positional",
                 "srl_features", "sentiment_labels", "simhash",
                 "text_stats", "dedup_exact", "mention_union"]:
        got = Q.QUERIES[name](spark, "ignored").toPandas()
        want = con.sql(Q.ORACLES[name]).df()
        got = got[sorted(got.columns)].reset_index(drop=True)
        want = want[sorted(want.columns)].reset_index(drop=True)
        assert got.shape == want.shape, name
        for c in got.columns:
            a, b = got[c], want[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                assert np.allclose(
                    a.astype(float).fillna(-9e99),
                    b.astype(float).fillna(-9e99)), (name, c)
            else:
                assert (a.astype(object).where(pd.notna(a), None).tolist()
                        == b.astype(object).where(pd.notna(b), None)
                        .tolist()), (name, c)
