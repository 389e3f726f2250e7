"""Curation pipeline: composed-decision semantics and the incremental
maintenance contract (incremental == full recompute for any newer-ids
split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clj_nlp_parse_spark.operators import curation as CU

GOOD = ("the table scan runs quickly and the merge sort is fast today "
        "again with more table scan rows")


def _corpus(spark):
    rows = [
        (1, GOOD),                               # admitted
        (2, GOOD + " extra words here now"),     # admitted
        (3, "the scan is fast and the sort is slow"),  # en but 9 words
        (4, GOOD),                               # exact dup of 1
        (10, GOOD + " brand new continuation of the corpus today"),
        (11, GOOD),                              # batch dup of BASE doc 1
        (12, GOOD + " extra words here now"),    # batch dup of base doc 2
        (13, "the secret answer is forty two exactly plus padding words "
             "to pass the length gate easily right here"),  # contaminated
        (14, GOOD + " something else entirely follows the good prefix"),
        (15, GOOD + " something else entirely follows the good prefix"),
        # 14/15: batch-internal dup — 15 must lose to 14
    ]
    ev = [(100, "the secret answer is forty two exactly")]
    tr = spark.createDataFrame(rows, "doc_id long, text string")
    evdf = spark.createDataFrame(ev, "doc_id long, text string")
    return tr, evdf


def test_curation_decide_reasons(spark):
    tr, ev = _corpus(spark)
    got = {r.doc_id: r.reason
           for r in CU.curation_decide(tr, ev).collect()}
    assert got[1] == "admitted"
    assert got[3] == "too_short"
    assert got[4] == "exact_dup"
    assert got[13] == "contaminated"
    assert got[14] == "admitted" and got[15] == "exact_dup"


def test_incremental_curation_equals_full_for_any_newer_ids_split(spark):
    tr, ev = _corpus(spark)
    want = sorted((r.doc_id, r.reason, r.keep)
                  for r in CU.curation_decide(tr, ev).collect())
    for thr in (4, 10, 12, 14):
        base = tr.where(F.col("doc_id") <= thr)
        batch = tr.where(F.col("doc_id") > thr)
        out = CU.incremental_curation(
            CU.curation_decide(base, ev), CU.hash_state(base), batch, ev)
        got = sorted((r.doc_id, r.reason, r.keep) for r in out.collect())
        assert got == want, thr


def test_incremental_cross_boundary_dup_loses_to_history(spark):
    # a batch doc duplicating a BASE doc must become exact_dup via the
    # (text_hash, min_id) state alone — the base corpus is never rescanned
    tr, ev = _corpus(spark)
    base = tr.where(F.col("doc_id") <= 4)
    batch = tr.where(F.col("doc_id") > 4)
    out = CU.incremental_curation(
        CU.curation_decide(base, ev), CU.hash_state(base), batch, ev)
    got = {r.doc_id: r.reason for r in out.collect()}
    assert got[11] == "exact_dup"    # dup of base doc 1
    assert got[12] == "exact_dup"    # dup of base doc 2
    assert got[1] == "admitted"      # history untouched
