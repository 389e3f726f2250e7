"""Hypothesis property tests — shrinking counterexample search on the two
highest-risk kernels: the as-of join family (vs pandas merge_asof as an
independent oracle) and the dictionary item compiler (vs the literal
reference massage port). Complements the seeded fuzz suites with
adversarial generation + automatic shrinking."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

BASE = dt.datetime(2025, 1, 1)


def _timeline(draw, n_ent, max_rows):
    ents = [f"e{i}" for i in range(draw(st.integers(1, n_ent)))]
    lefts, rights = [], []
    eid = 0
    for e in ents:
        used = set()
        for _ in range(draw(st.integers(0, max_rows))):
            t = draw(st.integers(0, 5000))
            ts = BASE + dt.timedelta(seconds=t)
            if draw(st.booleans()):
                if ("f", e, t) not in used:   # unique feature ts per key
                    used.add(("f", e, t))
                    rights.append((e, ts, float(draw(st.integers(0, 9)))))
            else:
                lefts.append((eid, e, ts))
                eid += 1
    return lefts, rights


@st.composite
def timelines(draw):
    return _timeline(draw, 3, 8)


@settings(max_examples=25, deadline=None)
@given(timelines())
def test_asof_backward_matches_pandas(spark_session_holder, tl):
    import pandas as pd

    from clj_nlp_parse_spark.operators import asof
    spark = spark_session_holder
    lefts_r, feats_r = tl
    if not lefts_r:
        return
    lefts = spark.createDataFrame(
        lefts_r, "event_id long, entity_id string, event_ts timestamp")
    rights = (spark.createDataFrame(
        feats_r or [("__none__", BASE, 0.0)],
        "entity_id string, feature_ts timestamp, fval double"))
    got = {r.event_id: (r.feature_ts, r.fval)
           for r in asof.asof_join(lefts, rights,
                                   on=["entity_id"]).collect()}
    lp = pd.DataFrame(lefts_r,
                      columns=["event_id", "entity_id", "event_ts"]) \
        .sort_values(["event_ts", "event_id"], kind="mergesort")
    rp = pd.DataFrame(feats_r or [("__none__", BASE, 0.0)],
                      columns=["entity_id", "feature_ts", "fval"]) \
        .sort_values("feature_ts", kind="mergesort")
    m = pd.merge_asof(lp, rp, left_on="event_ts", right_on="feature_ts",
                      by="entity_id", direction="backward",
                      allow_exact_matches=True)
    import pandas as pd2
    want = {int(r.event_id):
            ((None if pd2.isna(r.feature_ts)
              else r.feature_ts.to_pydatetime()),
             (None if pd2.isna(r.fval) else r.fval))
            for r in m.itertuples()}
    assert got == want


@st.composite
def dict_items(draw):
    vocab = ["the", "The", "THE", "and", "&", "Dups", "dups", "thes",
             "Teddy", "grams", "a", "Lines"]
    k = draw(st.integers(1, 4))
    content = " ".join(draw(st.sampled_from(vocab)) for _ in range(k))
    return dict(
        content=content,
        lem_min_len=draw(st.sampled_from([-1, 0, 3, 8])),
        case_min_tok=draw(st.sampled_from([-1, 0, 1, 2, 3])),
        first_det_chop=draw(st.booleans()),
        conj_regexp=draw(st.booleans()),
    )


@settings(max_examples=300, deadline=None)
@given(dict_items())
def test_compile_items_matches_reference_massage(item_kw):
    from clj_nlp_parse_spark.operators import dictionary as D
    from tests.test_fuzz_parity import _reference_massage
    item = D.DictItem(1, item_kw["content"], "L",
                      lem_min_len=item_kw["lem_min_len"],
                      case_min_tok=item_kw["case_min_tok"],
                      first_det_chop=item_kw["first_det_chop"],
                      conj_regexp=item_kw["conj_regexp"])
    want, want_cs = _reference_massage(item)
    got = D.compile_items([item])
    got_pats = ([(p.field, p.kind, p.value) for p in got[0].pattern]
                if got else [])
    assert got_pats == want
    if got:
        assert got[0].case_sen == want_cs
    else:
        assert want == []
