"""Worst-case probe for the dependency-tree chunk-membership lookup: a
doc of N tokens where EVERY OTHER token opens a chunk ('cat and cat
and ...' → n/2 single-token NP chunks). The pre-r5 formulation filtered
the chunk array once per token (O(n * #chunks) ≈ n^2/2 lambda evals per
doc); the shipped one builds a token→chunk-index array ONCE from the
sorted-disjoint chunk spans (O(n + #chunks), the ner.py break-array
trick — VERDICT_r04 #1). Identical output required.

Usage: python tools/probe_dep_chunks.py [n_tokens] [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clj_nlp_parse_spark import dialect, schema
from clj_nlp_parse_spark.operators.trees import (
    NP_HEAD_TAGS, VP_HEAD_TAGS, _in, _spark_let, chunks_sql, class_sql,
    kept_runs_sql)
from clj_nlp_parse_spark.session import get_spark


def dep_edges_old_sql(ws: str, tg: str, ch: str) -> str:
    # the pre-r5 Spark formulation: per-token chunk filter (kept verbatim
    # as the probe baseline)
    is_verb = lambda e: _in(e, schema.VERB_TAGS)
    rootix = (f"CASE WHEN size({tg}) = 0 THEN 1 ELSE "
              f"coalesce(try_element_at(filter(sequence(1, size({tg})),"
              f" j -> {is_verb(f'try_element_at({tg}, j)')}), 1), 1) "
              f"END")
    chh = (f"transform({ch}, c -> try_element_at(filter("
           f"sequence(c.beg + 1, c.fin), j -> "
           f"((c.label = 'NP' AND "
           f"{_in(f'try_element_at({tg}, j)', NP_HEAD_TAGS)}) OR "
           f"(c.label = 'VP' AND "
           f"{_in(f'try_element_at({tg}, j)', VP_HEAD_TAGS)}))), -1))")
    ci = (f"CASE WHEN size(h.ch) = 0 THEN cast(null as int) ELSE "
          f"try_element_at(filter(sequence(1, size(h.ch)), cj -> "
          f"try_element_at(h.ch, cj).beg <= i - 1 AND "
          f"i - 1 < try_element_at(h.ch, cj).fin), 1) END")
    hd = (f"try_element_at(transform(array(named_struct('ci', {ci})), "
          f"q -> CASE WHEN q.ci IS NULL THEN cast(null as int) "
          f"ELSE try_element_at(h.chh, q.ci) END), 1)")
    hds_body = (f"CASE WHEN size({ws}) = 0 THEN array() ELSE "
                f"transform(sequence(1, size({ws})), i -> {hd}) END")
    hds = (f"try_element_at(transform(array(named_struct("
           f"'ch', {ch}, 'chh', {chh})), h -> {hds_body}), 1)")
    at_hd = "try_element_at(z.hds, i)"
    dep = (f"named_struct("
           f"'head', CASE WHEN {at_hd} IS NOT NULL "
           f"AND {at_hd} != i THEN {at_hd} ELSE z.rt END, "
           f"'dependent', i, "
           f"'label', CASE WHEN {at_hd} IS NOT NULL "
           f"AND {at_hd} != i THEN 'mod' ELSE 'dep' END)")
    body = (f"CASE WHEN size({ws}) = 0 THEN "
            f"cast(array() as array<struct<head:int, dependent:int, "
            f"label:string>>) ELSE concat("
            f"array(named_struct('head', 0, 'dependent', z.rt, "
            f"'label', 'root')), "
            f"transform(filter(sequence(1, size({ws})), "
            f"i -> i != z.rt), i -> {dep})) END")
    return (f"try_element_at(transform(array(named_struct("
            f"'rt', {rootix}, 'hds', {hds})), z -> {body}), 1)")


def tree_expr_old(words: str) -> str:
    tags = (f"transform({words}, t -> "
            f"({dialect.pos_case_expr('t', 'spark')}))")
    l4 = _spark_let(
        {"ws": "z.ws", "tg": "z.tg", "ch": chunks_sql("z.kept", "spark")},
        dep_edges_old_sql("w.ws", "w.tg", "w.ch"), "w")
    l3 = _spark_let(
        {"ws": "x.ws", "tg": "x.tg",
         "kept": kept_runs_sql("x.cl", "x.tg", "spark")},
        l4, "z")
    l2 = _spark_let(
        {"ws": "y.ws", "tg": "y.tg", "cl": class_sql("y.tg", "spark")},
        l3, "x")
    return _spark_let({"ws": words, "tg": tags}, l2, "y")


def main():
    from clj_nlp_parse_spark.operators.trees import tree_expr

    n_tok = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark(app_name="probe_dep_chunks", parallelism=32,
                      shuffle_partitions=32)
    # 'cat and cat and ...': alternating NN/CC → every other token opens
    # (and closes) a single-token NP chunk — n/2 chunks per doc
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(f"array_join(transform(sequence(1, {n_tok}), i -> "
               f"CASE WHEN i % 2 = 0 THEN 'and' ELSE concat('cat', "
               f"cast(i % 97 as string)) END), ' ')").alias("text")) \
        .cache()
    docs.count()
    words = dialect.tokens_expr("text", "spark")

    def run(expr, label, explode=True):
        col = (F.explode(F.expr(expr)) if explode
               else F.expr(expr)).alias("e")
        df = docs.select("doc_id", col)
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{label}: {dt:.2f}s ({n_docs} docs x {n_tok} tokens, "
              f"{n_tok // 2} chunks/doc)")
        return dt

    t_new = run(tree_expr(words, "dep"), "new (token→chunk-index array)")
    # the full surface (edges + ser + dep; exercises the r5 linearized
    # chunks_sql pvp/dvp and serialize_sql open/close lookups too)
    run(tree_expr(words, "all"), "new ALL (edges+ser+dep)",
        explode=False)
    t_old = run(tree_expr_old(words), "old (per-token chunk filter)")
    diff = (docs.select(
        "doc_id",
        F.explode(F.expr(tree_expr(words, "dep"))).alias("a")).alias("l")
        .join(docs.select(
            "doc_id",
            F.explode(F.expr(tree_expr_old(words))).alias("b")).alias("r"),
            (F.col("l.doc_id") == F.col("r.doc_id"))
            & (F.col("l.a.dependent") == F.col("r.b.dependent")))
        .where("NOT (l.a <=> r.b)").count())
    print(f"speedup {t_old / t_new:.1f}x; output diff rows: {diff} "
          f"(must be 0)")
    spark.stop()
    sys.exit(1 if diff else 0)


if __name__ == "__main__":
    main()
