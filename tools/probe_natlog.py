"""Worst-case probe for the natlog polarity scan: ONE sentence of N
tokens (no [.!?] anywhere — the degenerate web document). The old
formulation re-sliced the sentence prefix per token (O(N^2) lambda
evals per doc); the shipped one scans a once-per-sentence bound
negation-position array (O(N * #negs)). Identical output required.

Usage: python tools/probe_natlog.py [n_tokens] [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators import natlog as NL
from clj_nlp_parse_spark.operators.features import sentence_words_sql
from clj_nlp_parse_spark.operators.trees import _spark_let
from clj_nlp_parse_spark.session import get_spark


def polarity_old(ws: str, i: str) -> str:
    # the pre-r4 formulation: slice the prefix per token
    return (f"CASE WHEN size(filter(slice({ws}, 1, {i} - 1), "
            f"x -> {NL._in('x', NL.NEGATION_WORDS)})) % 2 = 1 "
            f"THEN 'down' ELSE 'up' END")


def natlog_old_expr(text_col: str) -> str:
    oc = NL.operator_cols_sql("try_element_at(s0.ws, i)", "i",
                              "size(s0.ws)")
    row = (f"named_struct("
           f"'sent_index', cast(s0.si - 1 as bigint), "
           f"'token_index', cast(i as bigint), "
           f"'word', try_element_at(s0.ws, i), "
           f"'polarity', {polarity_old('s0.ws', 'i')}, "
           f"'operator', {oc['operator']}, "
           + ", ".join(f"'{k}', {oc[k]}" for k in NL.NATLOG_COLS[5:])
           + ")")
    one = _spark_let(
        {"si": "si", "ws": "try_element_at(c0.sents, si)"},
        f"transform(sequence(1, size(s0.ws)), i -> {row})", "s0")
    seq = ("CASE WHEN size(c0.sents) = 0 THEN array() "
           "ELSE sequence(1, size(c0.sents)) END")
    return _spark_let(
        {"sents": sentence_words_sql(text_col, "spark")},
        f"flatten(transform({seq}, si -> {one}))", "c0")


def natlog_r4_expr(text_col: str) -> str:
    # the r4 formulation: bound negation-position array, re-FILTERED per
    # token (O(n * #negs) — quadratic when every token is a negation);
    # r5 replaced the per-token count with a token-aligned polarity
    # array built once per sentence (natlog.aligned_polarity_sql)
    oc = NL.operator_cols_sql("try_element_at(s0.ws, i)", "i",
                              "size(s0.ws)")
    row = (f"named_struct("
           f"'sent_index', cast(s0.si - 1 as bigint), "
           f"'token_index', cast(i as bigint), "
           f"'word', try_element_at(s0.ws, i), "
           f"'polarity', {NL.polarity_sql('s0.np', 'i', 'spark')}, "
           f"'operator', {oc['operator']}, "
           + ", ".join(f"'{k}', {oc[k]}" for k in NL.NATLOG_COLS[5:])
           + ")")
    one = _spark_let(
        {"si": "si", "ws": "try_element_at(c0.sents, si)",
         "np": NL.neg_positions_sql("try_element_at(c0.sents, si)",
                                    "spark")},
        f"transform(sequence(1, size(s0.ws)), i -> {row})", "s0")
    seq = ("CASE WHEN size(c0.sents) = 0 THEN array() "
           "ELSE sequence(1, size(c0.sents)) END")
    return _spark_let(
        {"sents": sentence_words_sql(text_col, "spark")},
        f"flatten(transform({seq}, si -> {one}))", "c0")


def main():
    allneg = "--allneg" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_tok = int(args[0]) if args else 10_000
    n_docs = int(args[1]) if len(args) > 1 else 64
    spark = get_spark(app_name="probe_natlog", parallelism=32,
                      shuffle_partitions=32)
    if allneg:
        # EVERY token a negation: the worst case for any per-token scan
        # of the negation array (r5 aligned-polarity probe shape)
        word = "'not'"
    else:
        # every 7th token a negation → ~N/7 operators, one giant sentence
        word = ("CASE WHEN i % 7 = 0 THEN 'not' ELSE concat('w', "
                "cast(i % 97 as string)) END")
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"array_join(transform(sequence(1, {n_tok}), i -> "
               f"{word}), ' ')").alias("text")) \
        .cache()
    docs.count()

    def run(expr, label):
        df = docs.select("doc_id", F.explode(F.expr(expr)).alias("t"))
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s ({n_docs} docs x {n_tok}-token "
              f"single sentence)")
        return dt

    t_new = run(NL.natlog_expr("text"),
                "new (aligned polarity array, r5)")
    run(natlog_r4_expr("text"), "r4 (per-token count over bound negs)")
    t_old = run(natlog_old_expr("text"), "old (prefix slice per token)")
    diff = (docs.select("doc_id",
                        F.explode(F.expr(NL.natlog_expr("text"))).alias("a"))
            .withColumnRenamed("a", "x").alias("l")
            .join(docs.select(
                "doc_id",
                F.explode(F.expr(natlog_old_expr("text"))).alias("y"))
                .alias("r"),
                (F.col("l.doc_id") == F.col("r.doc_id"))
                & (F.col("l.x.token_index") == F.col("r.y.token_index")))
            .where("NOT (l.x <=> r.y)").count())
    print(f"speedup {t_old / t_new:.1f}x; output diff rows: {diff} "
          f"(must be 0)")
    spark.stop()
    sys.exit(1 if diff else 0)


if __name__ == "__main__":
    main()
