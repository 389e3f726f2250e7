"""Windowed / ordered operators (SURVEY.md §2.7, graft-added per north_rule).

All pure Window specs — no UDFs, no Python crossings:
  lag/lead of features per entity
  gap-based sessionization (cumulative-sum idiom)
  backfill (forward-fill) of late/missing values with leakage guard

Order is always (ts, tiebreak) so results are deterministic under any
parallelism — the engine's analog of the reference's determinism contract
(threadsafe_test.clj:6-21).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def entity_window(entity: str = "user_id", ts: str = "ts",
                  tiebreak: str | None = "event_id") -> WindowSpec:
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    return Window.partitionBy(entity).orderBy(*order)


def with_lag_lead(df: DataFrame, cols: dict[str, int],
                  entity: str = "user_id", ts: str = "ts",
                  tiebreak: str | None = "event_id") -> DataFrame:
    """cols: {column: offset} — positive = lag, negative = lead."""
    w = entity_window(entity, ts, tiebreak)
    out = df
    for c, off in cols.items():
        if off >= 0:
            out = out.withColumn(f"{c}_lag{off}", F.lag(c, off).over(w))
        else:
            out = out.withColumn(f"{c}_lead{-off}", F.lead(c, -off).over(w))
    return out


def sessionize(df: DataFrame, gap_seconds: int,
               entity: str = "user_id", ts: str = "ts",
               tiebreak: str | None = "event_id",
               session_col: str = "session_id") -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same entity exceeds gap_seconds. session_id
    is the 0-based cumulative count of gap starts per entity (cumsum idiom;
    batch analog of streaming session_window)."""
    w = entity_window(entity, ts, tiebreak)
    cum = (Window.partitionBy(entity)
           .orderBy(*([F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])))
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    prev = F.lag(ts).over(w)
    # millisecond arithmetic: exact integers, no sub-second truncation drift
    ms = lambda c: F.unix_millis(c.cast("timestamp"))  # NTZ-safe (UTC session)
    is_new = F.when(
        prev.isNull() |
        ((ms(F.col(ts)) - ms(prev)) > gap_seconds * 1000),
        F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("__new", is_new)
            .withColumn(session_col, (F.sum("__new").over(cum) - 1).cast("long"))
            .drop("__new"))


def backfill(df: DataFrame, value_col: str,
             entity: str = "user_id", ts: str = "ts",
             tiebreak: str | None = "event_id",
             out_col: str | None = None) -> DataFrame:
    """Forward-fill the last non-null value per entity in event-time order.
    Only ever looks backward → cannot leak future values."""
    w = entity_window(entity, ts, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col or f"{value_col}_filled",
                         F.last(value_col, ignorenulls=True).over(w))


# ------------------------------------------------------------ Python twins
# INDEPENDENT pure-Python restatements of the windowed semantics (sorted
# lists, no Window specs, no SQL) — the third comparator for the
# north_rule's windowed operators, matching the as-of engine's pandas
# merge_asof third oracle; fuzz-asserted in tests/test_fuzz_parity.py.

def _sorted_rows(rows: list[dict], entity: str, ts: str,
                 tiebreak: str | None) -> dict[object, list[dict]]:
    groups: dict[object, list[dict]] = {}
    for r in rows:
        groups.setdefault(r[entity], []).append(r)
    for g in groups.values():
        g.sort(key=(lambda r: (r[ts], r[tiebreak])) if tiebreak
               else (lambda r: r[ts]))
    return groups


def lag_lead_py(rows: list[dict], cols: dict[str, int],
                entity: str = "user_id", ts: str = "ts",
                tiebreak: str | None = "event_id") -> list[dict]:
    """Twin of with_lag_lead: index arithmetic on the per-entity sort."""
    out = []
    for g in _sorted_rows(rows, entity, ts, tiebreak).values():
        for i, r in enumerate(g):
            r = dict(r)
            for c, off in cols.items():
                if off >= 0:
                    r[f"{c}_lag{off}"] = g[i - off][c] if i - off >= 0 \
                        else None
                else:
                    r[f"{c}_lead{-off}"] = g[i - off][c] \
                        if i - off < len(g) else None
            out.append(r)
    return out


def sessionize_py(rows: list[dict], gap_seconds: int,
                  entity: str = "user_id", ts: str = "ts",
                  tiebreak: str | None = "event_id",
                  session_col: str = "session_id") -> list[dict]:
    """Twin of sessionize: a session breaks when the millisecond delta to
    the previous event STRICTLY exceeds the gap (boundary-exact)."""
    out = []
    for g in _sorted_rows(rows, entity, ts, tiebreak).values():
        sid = -1
        prev = None
        for r in g:
            # naive datetimes are UTC (the engine pins a UTC session TZ),
            # so the twin must not consult the host timezone
            dt = r[ts]
            if dt.tzinfo is None:
                from datetime import timezone as _tz
                dt = dt.replace(tzinfo=_tz.utc)
            t = int(dt.timestamp() * 1000)
            if prev is None or t - prev > gap_seconds * 1000:
                sid += 1
            prev = t
            r = dict(r)
            r[session_col] = sid
            out.append(r)
    return out


def backfill_py(rows: list[dict], value_col: str,
                entity: str = "user_id", ts: str = "ts",
                tiebreak: str | None = "event_id",
                out_col: str | None = None) -> list[dict]:
    """Twin of backfill: carry the last non-null value forward, never
    backward — the zero-leakage direction by construction."""
    out = []
    for g in _sorted_rows(rows, entity, ts, tiebreak).values():
        carried = None
        for r in g:
            if r[value_col] is not None:
                carried = r[value_col]
            r = dict(r)
            r[out_col or f"{value_col}_filled"] = carried
            out.append(r)
    return out


def rolling_features_py(rows: list[dict], entity: str = "user_id",
                        ts: str = "ts", tiebreak: str = "event_id",
                        value: str = "value") -> list[dict]:
    """Twin of q_rolling_features: trailing-3 mean/max (nulls ignored,
    None when the whole window is null — SQL aggregate semantics) and
    delta vs the previous row (None if either side is null)."""
    out = []
    for g in _sorted_rows(rows, entity, ts, tiebreak).values():
        for i, r in enumerate(g):
            win = [x[value] for x in g[max(0, i - 2):i + 1]
                   if x[value] is not None]
            prev = g[i - 1][value] if i > 0 else None
            r = dict(r)
            r["roll_mean3"] = sum(win) / len(win) if win else None
            r["roll_max3"] = max(win) if win else None
            r["delta"] = (r[value] - prev
                          if r[value] is not None and prev is not None
                          else None)
            out.append(r)
    return out


def daily_rollup_py(rows: list[dict], entity: str = "user_id",
                    ts: str = "ts", value: str = "value") -> dict:
    """Twin of q_daily_rollup: {(entity, date): (n_events, sum, min,
    max)} with SQL null semantics (nulls ignored by sum/min/max, count
    counts rows; all-null group -> None aggregates)."""
    groups: dict = {}
    for r in rows:
        groups.setdefault((r[entity], r[ts].date()), []).append(r[value])
    return {k: (len(vs),
                sum(nn) if (nn := [v for v in vs if v is not None])
                else None,
                min(nn) if nn else None,
                max(nn) if nn else None)
            for k, vs in groups.items()}


def session_stats_py(rows: list[dict], gap_seconds: int,
                     entity: str = "user_id", ts: str = "ts",
                     value: str = "value") -> dict:
    """Twin of q_session_stats: sessionize_py then per-session count,
    millisecond span, and null-ignoring value sum — {(entity,
    session_id): (n_events, duration_ms, sum_value)}."""
    from datetime import timezone as _tz
    groups: dict = {}
    for r in sessionize_py(rows, gap_seconds, entity=entity, ts=ts):
        groups.setdefault((r[entity], r["session_id"]), []).append(r)
    def ms(dt):
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=_tz.utc)
        return int(dt.timestamp() * 1000)
    return {k: (len(g),
                ms(max(r[ts] for r in g)) - ms(min(r[ts] for r in g)),
                sum(nn) if (nn := [r[value] for r in g
                                   if r[value] is not None]) else None)
            for k, g in groups.items()}


def interval_overlap_py(rows: list[dict], entity: str = "user_id",
                        ts: str = "ts") -> set:
    """Twin of the interval_overlap_join query: intervals are the
    event_id % 10 == 0 rows widened +600 s; result = {(event_id,
    user_id, iv_id)} for every point row inside a same-entity interval,
    INCLUSIVE on both ends (reference overlap? semantics)."""
    from datetime import timezone as _tz

    def ms(dt):
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=_tz.utc)
        return int(dt.timestamp() * 1000)

    ivs = [(r[entity], ms(r[ts]), ms(r[ts]) + 600_000, r["event_id"])
           for r in rows if r["event_id"] % 10 == 0]
    return {(p["event_id"], p[entity], iv_id)
            for p in rows if p["event_id"] % 10 != 0
            for u, beg, end, iv_id in ivs
            if p[entity] == u and beg <= ms(p[ts]) <= end}


def first_non_null_py(rows: list[dict], entity: str = "user_id",
                      ts: str = "ts", tiebreak: str = "event_id",
                      value: str = "value") -> dict:
    """Twin of the first_non_null query: per entity, the first non-null
    value in (ts, tiebreak) order, with nulls injected on every 5th
    event_id — {entity: first_value_or_None}."""
    out = {}
    for e, g in _sorted_rows(rows, entity, ts, tiebreak).items():
        out[e] = next((r[value] for r in g
                       if r["event_id"] % 5 != 0
                       and r[value] is not None), None)
    return out
