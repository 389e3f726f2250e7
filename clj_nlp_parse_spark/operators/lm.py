"""N-gram language-model perplexity scoring — the CCNet/Gopher-style
corpus-quality signal (score every document's fluency under a small LM
trained on a held split of the corpus itself; low-likelihood docs are
boilerplate/gibberish candidates).

Graft addition (round brief): the reference has no LM, but a 100 TB
training-data pipeline filters on exactly this signal. Spark-first
shape:

- TRAIN: one scan of the consistent-sample train split (the same
  h31-hash split operator the engine already exposes, so the split is
  reproducible and joinable) -> one hash aggregation to bigram counts
  ``c2(prev, cur)``. Everything else derives from that model table
  without touching the corpus again: context counts ``c1`` are a
  re-aggregation of ``c2`` (model-sized, not corpus-sized), and the
  vocabulary size is a distinct count over ``c2`` (every train word
  appears as some bigram's ``cur`` because of the <s> boundary term).
  The model table is localCheckpoint-materialized once so the eager
  vocab count and the scoring join share one computation (the CC-loop
  lineage-cut idiom, BENCH.md lesson 7).
- SCORE: every doc explodes to its bigram terms, LEFT-joins the model
  (equi-join on the bigram key; the model is broadcast — it is
  vocab-bounded by construction, and ``min_count`` prunes the bigram
  table at scale), and re-aggregates per doc_id.
- EXACTNESS ACROSS ENGINES: per-term negative log-likelihood is
  quantized to integer MICRO-NATS — ``floor(round(-ln p, 6) * 1e6 +
  0.5)`` as BIGINT — so the per-doc sum is an exact integer sum,
  independent of shuffle/accumulation order (a raw double sum would be
  non-associative and engine-order-dependent). ``p`` itself is a single
  IEEE division of exact integers, bit-identical in Spark and DuckDB;
  ln differs by at most an ulp between libm and the JVM, absorbed by
  the 1e-6 rounding grid (the tfidf round(,9) precedent).

Model: add-one (Laplace) bigram LM. For a doc w1..wn the terms are
(<s>,w1), (w1,w2) .. (w(n-1),wn); P(b|a) = (c2(a,b)+1) / (c1(a)+V)
where c1(a) = sum_b c2(a,b) and V = |train vocab| + 1 (the +1 is the
<unk> outcome). OOV words and unseen contexts need no explicit <unk>
mapping: they simply miss the model join and coalesce to 0, which IS
the <unk> probability under add-one. Outputs per doc: n_terms,
nll_micro (exact integer micro-nats), avg_nll (nats/term, NULL for
empty docs). Perplexity = exp(avg_nll) is left to the caller: exp's
last-ulp jitter on a magnitude-1e8 result would not survive a fixed
decimal grid, while avg_nll derives from exact integers.
"""

from __future__ import annotations

import math
import re as _re
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clj_nlp_parse_spark import dialect
from clj_nlp_parse_spark.operators import dedup as DD

BOS = "<s>"
LM_SPLIT_RATE = 0.5
_MOD = DD.MINHASH_MOD


def _terms_sql(words: str, d: str) -> str:
    """Bigram-term array over a bound words-array expression: one struct
    (prev, cur) per token, prev of the first token = <s>."""
    if d == "spark":
        body = (f"named_struct("
                f"'prev', CASE WHEN i = 1 THEN '{BOS}' "
                f"ELSE try_element_at(z.ws, i - 1) END, "
                f"'cur', try_element_at(z.ws, i))")
        arr = (f"CASE WHEN size(z.ws) = 0 THEN "
               f"cast(array() as array<struct<prev:string, cur:string>>) "
               f"ELSE transform(sequence(1, size(z.ws)), i -> {body}) END")
        # let-bind ws once (HOF free variables re-evaluate per lambda
        # invocation — BENCH.md lesson 1)
        return (f"try_element_at(transform(array(named_struct("
                f"'ws', {words})), z -> {arr}), 1)")
    body = (f"struct_pack(prev := CASE WHEN i = 1 THEN '{BOS}' "
            f"ELSE ({words})[i - 1] END, cur := ({words})[i])")
    return f"list_transform(range(1, len({words}) + 1), i -> {body})"


def bigram_terms(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(id, prev, cur) — one row per bigram term, zero shuffle."""
    words = dialect.tokens_expr(text_col, "spark")
    t = df.select(F.col(id_col),
                  F.explode(F.expr(_terms_sql(words, "spark"))).alias("t"))
    return t.select(id_col, F.col("t.prev").alias("prev"),
                    F.col("t.cur").alias("cur"))


def fit(train: DataFrame, text_col: str = "text",
        id_col: str = "doc_id", min_count: int = 1
        ) -> tuple[DataFrame, DataFrame, int]:
    """Fit the add-one bigram LM on `train`: returns (c2, c1, v).
    ``min_count`` prunes the bigram table (model-size knob at scale;
    pruned bigrams fall back to the smoothing mass). One train scan;
    the model table is localCheckpoint-materialized once so the eager
    vocab count and any number of scoring jobs share it."""
    c2 = (bigram_terms(train, text_col, id_col)
          .groupBy("prev", "cur").agg(F.count("*").alias("c2")))
    if min_count > 1:
        c2 = c2.where(F.col("c2") >= min_count)
    c2 = c2.localCheckpoint(eager=True)
    c1 = c2.groupBy("prev").agg(F.sum("c2").alias("c1"))
    v = c2.select("cur").distinct().count() + 1  # documented eager scalar
    return c2, c1, v


def score_terms(docs: DataFrame, c2: DataFrame, c1: DataFrame, v: int,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-term micro-nat scores (id, prev, cur, li) — STATELESS
    (projection + broadcast model joins), so it runs unchanged on a
    structured stream (tests/test_streaming.py)."""
    t = bigram_terms(docs, text_col, id_col)
    j = (t.join(F.broadcast(c2), ["prev", "cur"], "left")
         .join(F.broadcast(c1), ["prev"], "left"))
    p = (F.expr("cast(coalesce(c2, 0) + 1 as double)")
         / F.expr(f"cast(coalesce(c1, 0) + {v} as double)"))
    li = (F.floor(F.round(-F.log(p), 6) * 1000000 + F.lit(0.5))
          .cast("bigint"))
    return j.select(id_col, "prev", "cur", li.alias("li"))


def score(docs: DataFrame, c2: DataFrame, c1: DataFrame, v: int,
          text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc scores: exact integer micro-nat sum + count, empty docs
    resurrected by the left join with (n_terms 0, NULL avg_nll)."""
    ag = (score_terms(docs, c2, c1, v, text_col, id_col)
          .groupBy(id_col)
          .agg(F.sum("li").cast("long").alias("nll_micro"),
               F.count("*").cast("long").alias("n_terms")))
    n = F.coalesce(F.col("n_terms"), F.lit(0))
    return (docs.select(id_col).join(ag, [id_col], "left")
            .select(
                id_col,
                n.alias("n_terms"),
                F.coalesce(F.col("nll_micro"), F.lit(0)).cast("long")
                .alias("nll_micro"),
                F.when(n == 0, F.lit(None).cast("double")).otherwise(
                    F.round(F.col("nll_micro").cast("double") / 1000000.0
                            / F.col("n_terms"), 9)).alias("avg_nll")))


def fit_score(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", split_rate: float = LM_SPLIT_RATE,
              min_count: int = 1) -> DataFrame:
    """Fit on the consistent-sample split, score EVERY doc. One train
    scan + one corpus scan + model-sized broadcast joins + one per-doc
    re-aggregation."""
    h = dialect.hash32_expr(f"cast({id_col} as string)", "spark")
    thr = int(split_rate * _MOD)
    train = docs.where(F.expr(f"({h} % {_MOD})") < thr)
    c2, c1, v = fit(train, text_col, id_col, min_count)
    return score(docs, c2, c1, v, text_col, id_col)


def oracle_sql(split_rate: float = LM_SPLIT_RATE) -> str:
    """DuckDB oracle: the same model and quantization in DuckDB SQL
    (vocab size via scalar subquery instead of the Spark-side eager
    count)."""
    words = dialect.tokens_expr("text", "duck")
    h = dialect.hash32_expr("CAST(doc_id AS VARCHAR)", "duck")
    thr = int(split_rate * _MOD)
    terms = _terms_sql("words", "duck")
    return f"""
    WITH wd AS (SELECT doc_id, {words} AS words FROM documents),
    tm AS (SELECT doc_id, unnest({terms}) AS t FROM wd
           WHERE ({h} % {_MOD}) < {thr}),
    c2 AS (SELECT t.prev AS prev, t.cur AS cur, count(*) AS c2
           FROM tm GROUP BY 1, 2),
    c1 AS (SELECT prev, sum(c2) AS c1 FROM c2 GROUP BY prev),
    at AS (SELECT doc_id, unnest({terms}) AS t FROM wd),
    sc AS (SELECT a.doc_id,
             CAST(floor(round(-ln(
               CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)
               / CAST(coalesce(c1.c1, 0)
                      + (SELECT count(DISTINCT cur) + 1 FROM c2)
                      AS DOUBLE)), 6) * 1000000 + 0.5) AS BIGINT) AS li
           FROM at a
           LEFT JOIN c2 ON c2.prev = a.t.prev AND c2.cur = a.t.cur
           LEFT JOIN c1 ON c1.prev = a.t.prev),
    ag AS (SELECT doc_id, CAST(sum(li) AS BIGINT) AS nll_micro,
             CAST(count(*) AS BIGINT) AS n_terms
           FROM sc GROUP BY doc_id)
    SELECT d.doc_id, coalesce(ag.n_terms, 0) AS n_terms,
           coalesce(ag.nll_micro, 0) AS nll_micro,
           CASE WHEN coalesce(ag.n_terms, 0) = 0 THEN CAST(NULL AS DOUBLE)
                ELSE round(CAST(ag.nll_micro AS DOUBLE) / 1000000.0
                           / ag.n_terms, 9) END AS avg_nll
    FROM documents d LEFT JOIN ag ON ag.doc_id = d.doc_id
    ORDER BY d.doc_id"""


# ------------------------------------------------------------- twin
def lm_perplexity_py(docs: list[tuple],
                     split_rate: float = LM_SPLIT_RATE) -> dict:
    """INDEPENDENT pure-Python twin (Counter + math.log, no SQL
    rendering): {doc_id: (n_terms, nll_micro, avg_nll)}. Fuzz-pinned in
    tests/test_fuzz_parity.py."""
    thr = int(split_rate * _MOD)

    def terms(text):
        ws = DD._tokens_py(text)
        return list(zip([BOS] + ws[:-1], ws))

    c2: Counter = Counter()
    for doc_id, text in docs:
        if DD.h31_py(str(doc_id)) < thr:
            c2.update(terms(text))
    c1: Counter = Counter()
    for (a, _b), c in c2.items():
        c1[a] += c
    v = len({b for _a, b in c2}) + 1

    out = {}
    for doc_id, text in docs:
        tm = terms(text)
        micro = 0
        for ab in tm:
            p = (c2.get(ab, 0) + 1) / (c1.get(ab[0], 0) + v)
            micro += math.floor(round(-math.log(p), 6) * 1000000 + 0.5)
        avg = round(micro / 1000000.0 / len(tm), 9) if tm else None
        out[doc_id] = (len(tm), micro, avg)
    return out
