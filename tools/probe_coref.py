"""Worst-case probe for the coref clustering scan (r5): two adversarial
shapes a web corpus contains —
  directory : EVERY mention a distinct key (m = d; the r4 form's
              per-key count filter and per-mention array_position were
              O(m*d) = m^2 here)
  chains    : every mention in a 2-mention chain (d = m/2, all keys
              qualify; the per-mention lookups were O(m*d) too)
The shipped sort-based form is O(m log m + d). Identical output
required (the r4 formulation is kept verbatim below as the baseline).

Usage: python tools/probe_coref.py [n_mentions] [n_docs] [shape]
       shape in {directory, chains, both(default)}
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators import coref as CRF
from clj_nlp_parse_spark.operators.coref import doc_mentions_spark
from clj_nlp_parse_spark.operators.features import sentence_words_sql
from clj_nlp_parse_spark.operators.trees import _spark_let
from clj_nlp_parse_spark.session import get_spark


def coref_r4_expr(text_col: str) -> str:
    # the pre-r5 formulation (verbatim): O(d*m) counts + O(m*d) lookups
    allm = doc_mentions_spark("c0.sents")
    counts = (f"transform(k0.dkeys, k -> "
              f"size(filter(k0.allm, m -> m.key = k)))")
    qkeys = (f"transform(filter(CASE WHEN size(k1.dkeys) = 0 THEN array() "
             f"ELSE sequence(1, size(k1.dkeys)) END, i -> "
             f"try_element_at(k1.counts, i) >= 2), i -> "
             f"try_element_at(k1.dkeys, i))")
    row = (f"named_struct("
           f"'chain_id', array_position(k2.qkeys, m.key), "
           f"'mention_key', m.key, 'label', m.label, "
           f"'sent_index', cast(m.sent_index as bigint), "
           f"'token_beg', cast(m.tok_beg + 1 as bigint), "
           f"'token_end', cast(m.tok_end + 1 as bigint), "
           f"'head_index', cast(m.tok_end as bigint), "
           f"'chain_size', cast(try_element_at(k2.counts, "
           f"cast(array_position(k2.dkeys, m.key) as int)) as bigint))")
    body = (f"transform(filter(k2.allm, m -> "
            f"array_contains(k2.qkeys, m.key)), m -> {row})")
    l_k2 = _spark_let(
        {"allm": "k1.allm", "dkeys": "k1.dkeys", "counts": "k1.counts",
         "qkeys": qkeys}, body, "k2")
    l_k1 = _spark_let(
        {"allm": "k0.allm", "dkeys": "k0.dkeys", "counts": counts},
        l_k2, "k1")
    l_k0 = _spark_let(
        {"allm": "y.allm",
         "dkeys": "array_sort(array_distinct("
                  "transform(y.allm, m -> m.key)))"},
        l_k1, "k0")
    l_y = _spark_let({"allm": allm}, l_k0, "y")
    return _spark_let({"sents": sentence_words_sql(text_col, "spark")},
                      l_y, "c0")


def doc_text(shape: str, n_mentions: int) -> str:
    """Adversarial mention streams. Mentions are maximal SAME-TYPE runs
    and the clustering key is the lemma-joined run text, so DISTINCT
    keys need distinct word sequences: 3-token runs over the 9 ARTIFACT
    words give 9^3 = 729 combos, 4-token runs 6561 — itertools.product
    enumerates them without repetition, so 'directory' yields m
    mentions with m distinct keys (every mention a singleton — the
    shape that made the r4 per-key filter O(m^2)). 'chains' repeats
    each run once more, adjacent but severed by 'the', so every key
    forms a 2-mention chain (all keys qualify)."""
    import itertools
    from clj_nlp_parse_spark.operators.ner import GAZETTEER
    # exclude 'tables': it lemma-collides with 'table' and would alias
    # keys that must stay distinct; 8 lemma-stable words, 8^5 = 32768
    arts = [w for w in GAZETTEER["ARTIFACT"] if w != "tables"]
    runs = (" ".join(c) for c in itertools.product(arts, repeat=5))
    out = []
    for _ in range(n_mentions if shape == "directory"
                   else n_mentions // 2):
        r = next(runs)
        out.append(r)
        if shape == "chains":
            out.append(r)
    # 'the' breaks the run between mentions (not in any gazetteer)
    return " the ".join(out)


def main():
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    shapes = ([sys.argv[3]] if len(sys.argv) > 3
              else ["directory", "chains"])
    spark = get_spark(app_name="probe_coref", parallelism=32,
                      shuffle_partitions=32)
    rc = 0
    for shape in shapes:
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"),
            F.lit(doc_text(shape, n_m)).alias("text")).cache()
        docs.count()

        def run(expr, label):
            df = docs.select("doc_id", F.explode(F.expr(expr)).alias("c"))
            df.write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(f"{shape}/{label}: {dt:.2f}s "
                  f"({n_docs} docs x {n_m} mentions)")
            return dt

        t_new = run(CRF.coref_expr("text"), "new (sort-based)")
        t_old = run(coref_r4_expr("text"), "r4 (per-key filter)")
        a = docs.select("doc_id", F.posexplode(
            F.expr(CRF.coref_expr("text"))).alias("p", "c")).alias("l")
        b = docs.select("doc_id", F.posexplode(
            F.expr(coref_r4_expr("text"))).alias("p", "c")).alias("r")
        diff = (a.join(b, (F.col("l.doc_id") == F.col("r.doc_id"))
                       & (F.col("l.p") == F.col("r.p")))
                .where("NOT (l.c <=> r.c)").count())
        cnt_a, cnt_b = a.count(), b.count()
        print(f"{shape}: speedup {t_old / t_new:.1f}x; rows "
              f"{cnt_a} vs {cnt_b}; diff rows: {diff} (must be 0)")
        if diff or cnt_a != cnt_b:
            rc = 1
        docs.unpersist()
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
