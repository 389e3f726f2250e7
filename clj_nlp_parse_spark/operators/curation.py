"""End-to-end corpus curation: the admission decision and its incremental
maintenance loop.

`curation_decide` composes the gates a 100 TB curation job runs in ONE
plan (language-ID + quality + min-length, exact-dedup keep, eval-set
decontamination) with a first-failing drop REASON per document.

`incremental_curation` is the production update shape (the daily crawl
increment): only the NEW batch is scored; the historical state a running
pipeline maintains is just the (text_hash, min_doc_id) table. Correctness
contract (oracle-checked by the curation_incremental query, same pattern
as incremental_asof_update): output == full curation_decide(base ∪ batch)
whenever batch ids are all NEWER than base ids — which is exactly what a
crawl increment is. Under that contract no old decision can change: the
exact-dedup keep is min-id per hash (new ids can never steal it), and the
eval set is fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clj_nlp_parse_spark import dialect
from clj_nlp_parse_spark.operators import dedup as DD
from clj_nlp_parse_spark.operators import textstats as TS


def _scored(tr: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc gate columns: lang_pred, quality, n_words, text_hash."""
    wd = tr.withColumn(
        "words", F.expr(dialect.tokens_expr(text_col, "spark")))
    return wd.select(
        id_col,
        F.expr(TS.lang_id_sql("words", "spark")).alias("lang_pred"),
        F.expr(TS.quality_score_sql(text_col, "words", "spark"))
        .alias("quality"),
        F.expr("size(words)").cast("long").alias("n_words"),
        F.expr(f"md5({DD.norm_text_sql(text_col, 'spark')})")
        .alias("text_hash"))


def _reason_col():
    return (F.when(F.col("lang_pred") != "en", "not_en")
            .when(F.col("quality") < 0.4, "low_quality")
            .when(F.col("n_words") < 10, "too_short")
            .when(~F.col("keep_exact"), "exact_dup")
            .when(F.col("contaminated"), "contaminated")
            .otherwise("admitted"))


def curation_decide(tr: DataFrame, ev: DataFrame, n: int = 3,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Full admission decision: (id, reason, keep). One corpus scan + one
    hash-keyed window + one broadcast shingle semi-probe."""
    q = _scored(tr, id_col, text_col)
    w = Window.partitionBy("text_hash")
    d = q.withColumn("keep_exact",
                     F.col(id_col) == F.min(id_col).over(w))
    # join the SMALL contaminated-id set (the oracle's `bad` side), never a
    # corpus-sized per-doc flags relation — at 10^12 rows the flags join
    # would be a full-corpus shuffle (review r03 #2)
    bad = DD.contaminated_ids(tr, ev, n=n, id_col=id_col,
                              text_col=text_col)
    out = (d.join(bad.withColumn("__c", F.lit(True)), id_col, "left")
           .withColumn("contaminated",
                       F.coalesce(F.col("__c"), F.lit(False))))
    reason = _reason_col()
    return out.select(id_col, reason.alias("reason"),
                      (reason == "admitted").alias("keep"))


def hash_state(tr: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """The ONLY historical state incremental curation needs:
    (text_hash, min id seen) — tiny relative to the corpus, maintainable
    as a merge-on-hash table."""
    h = F.expr(f"md5({DD.norm_text_sql(text_col, 'spark')})")
    return (tr.select(F.col(id_col), h.alias("text_hash"))
            .groupBy("text_hash")
            .agg(F.min(id_col).alias("min_id")))


def incremental_curation(prev_out: DataFrame, prev_hashes: DataFrame,
                         batch: DataFrame, ev: DataFrame, n: int = 3,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Score ONLY the new batch; pass prior decisions through untouched.

    Requires every batch id > every historical id (a crawl increment).
    The batch's exact-dedup keep consults the batch-local window min AND
    the historical (text_hash, min_id) state: a hash seen before can never
    be kept again. The corpus is never rescanned — work is proportional to
    the batch plus one join against the hash state (shuffle join; the
    state is corpus-distinct-texts-sized, usually NOT broadcastable)."""
    q = _scored(batch, id_col, text_col)
    w = Window.partitionBy("text_hash")
    d = (q.withColumn("__bmin", F.min(id_col).over(w))
         .join(prev_hashes.select("text_hash",
                                  F.col("min_id").alias("__hmin")),
               "text_hash", "left")
         .withColumn("keep_exact",
                     F.col("__hmin").isNull()
                     & (F.col(id_col) == F.col("__bmin"))))
    bad = DD.contaminated_ids(batch, ev, n=n, id_col=id_col,
                              text_col=text_col)
    out = (d.join(bad.withColumn("__c", F.lit(True)), id_col, "left")
           .withColumn("contaminated",
                       F.coalesce(F.col("__c"), F.lit(False))))
    reason = _reason_col()
    rec = out.select(id_col, reason.alias("reason"),
                     (reason == "admitted").alias("keep"))
    return prev_out.unionByName(rec)


# ------------------------------------------------------------ Python twin
# INDEPENDENT pure-Python restatement of the admission decision (re +
# hashlib, no SQL, no windows, no joins) — third comparator per the
# dedup.minhash_sig_py rationale; fuzz-asserted in
# tests/test_fuzz_parity.py.

import hashlib as _hashlib
import re as _re

from clj_nlp_parse_spark.operators.dedup import _shingles_py, _tokens_py
from clj_nlp_parse_spark.operators.textstats import text_stats_py


def curation_decide_py(train: list[tuple], ev: list[tuple],
                       n: int = 3) -> dict:
    """Twin of curation_decide over [(id, text)]: {id: (reason, keep)}
    with the same first-failing gate order (not_en → low_quality →
    too_short → exact_dup → contaminated → admitted)."""
    ev_shingles = set()
    for _, text in ev:
        ev_shingles.update(_shingles_py(_tokens_py(text), n))

    min_id_by_hash: dict[str, int] = {}
    scored = {}
    for doc_id, text in train:
        st = text_stats_py(text)
        h = None
        if text is not None:
            norm = _re.sub(r"\s+", " ", text.lower()).strip()
            h = _hashlib.md5(norm.encode("utf-8")).hexdigest()
            if h not in min_id_by_hash or doc_id < min_id_by_hash[h]:
                min_id_by_hash[h] = doc_id
        scored[doc_id] = (st, h, text)

    out = {}
    for doc_id, (st, h, text) in scored.items():
        contaminated = any(
            s in ev_shingles for s in _shingles_py(_tokens_py(text), n))
        if st["lang_pred"] != "en":
            reason = "not_en"
        elif st["quality"] is not None and st["quality"] < 0.4:
            reason = "low_quality"
        elif st["n_word_tokens"] < 10:
            reason = "too_short"
        elif min_id_by_hash.get(h) != doc_id:
            reason = "exact_dup"
        elif contaminated:
            reason = "contaminated"
        else:
            reason = "admitted"
        out[doc_id] = (reason, reason == "admitted")
    return out
