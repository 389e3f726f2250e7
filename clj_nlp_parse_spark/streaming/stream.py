"""Structured Streaming operators — the streaming forms of the engine's
windowed semantics (SURVEY.md §2.7).

The reference is purely batch (request/response, parse.clj:132-150); the
engine adds native streaming equivalents:
  - watermarked tumbling-window aggregation of events per entity
  - native session_window aggregation (the streaming form of the batch
    gap-sessionize cumsum idiom in operators/windows.py)
  - streaming caption feature extraction (the same Catalyst expressions as
    batch — the annotate() projection is stateless, so it is directly
    streamable)

All run with `readStream` sources and standard sinks; tests drive them with
a file source + Trigger.AvailableNow + memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(stream: DataFrame, window: str = "10 minutes",
                          watermark: str = "30 minutes",
                          entity: str = "user_id",
                          ts: str = "ts") -> DataFrame:
    """Late-data-tolerant tumbling-window counts per entity."""
    return (stream
            .withWatermark(ts, watermark)
            .groupBy(F.window(F.col(ts), window).alias("win"),
                     F.col(entity))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    entity, "n_events", "sum_value"))


def session_aggregate(stream: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours",
                      entity: str = "user_id",
                      ts: str = "ts") -> DataFrame:
    """Native session_window aggregation — streaming gap sessionization."""
    return (stream
            .withWatermark(ts, watermark)
            .groupBy(F.session_window(F.col(ts), gap).alias("sess"),
                     F.col(entity))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("sess.start").alias("sess_start"),
                    F.col("sess.end").alias("sess_end"),
                    entity, "n_events"))


def streaming_caption_features(stream: DataFrame,
                               text_col: str = "caption") -> DataFrame:
    """Stateless caption annotation on a stream: the exact batch projection
    (pure Catalyst) applied to readStream input."""
    from clj_nlp_parse_spark.operators.features import (
        pos_tag_feature_cols, token_feature_cols)
    from clj_nlp_parse_spark.functions import text as tx
    ann = tx.annotate(stream, text_col)
    return ann.select(
        "*",
        *pos_tag_feature_cols("toks"),
    )


def streaming_image_features(stream: DataFrame,
                             buckets: int = 64) -> DataFrame:
    """Streaming image feature extraction — the ingest-side of the
    north-rule pipeline run continuously: the SAME one-Arrow-stage
    decode → stats → drop-bytes operator as batch (mapInPandas is
    stateless per batch, so extract_image_features streams unchanged),
    fed by readStream over the images table. Bytes still never cross a
    shuffle: the stage runs straight off the streaming scan and only the
    ~48-byte feature rows reach the sink / downstream stateful as-of."""
    from clj_nlp_parse_spark.operators.images import extract_image_features
    return extract_image_features(stream, buckets=buckets)


def streaming_asof_carry(stream: DataFrame,
                         entity: str = "entity_id",
                         ts: str = "ts",
                         side: str = "side",
                         value: str = "fval") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState — the
    SURVEY.md §2.8 extension point): streaming point-in-time feature
    materialization.

    Input is the UNIONED stream of feature rows (side='feature', carrying
    `value`) and event rows (side='event') — the streaming form of the
    batch union_window as-of (operators/asof.py). Per entity, GroupState
    holds the latest (feature_ts NANOSECONDS, value) seen — full timestamp
    resolution, so equal-ts inclusive semantics survive a restart. The
    whole per-key group is materialized and sorted ONCE by (ts, side-tag)
    (features before events at equal ts → inclusive): applyInPandasWithState
    hands the group over as multiple Arrow chunks with NO ordering guarantee
    between (or within) chunks, so any per-chunk sort that carries state
    across chunks silently mismatches once a key exceeds one Arrow batch
    (~2048 rows at the session setting). Exact when features are not late
    relative to the events they serve (the standard feed order); for
    out-of-order features use streaming_asof_buffered.

    Output: one row per event — (entity, event_ts, feature_ts, value).
    """
    import pandas as pd

    out_schema = (f"{entity} string, event_ts timestamp, "
                  f"feature_ts timestamp, {value} double")
    # leading version field: Spark validates state schema by TYPE only, so
    # without it a pre-nanosecond checkpoint (fts in ms) would silently
    # read back as ns; the (int, long, double) shape makes an old
    # (long, double) checkpoint fail FAST at restart instead
    state_schema = "ver int, fts_ns long, fval double"

    def carry(key, pdfs, state):
        if state.exists:
            _ver, fts_ns, fval = state.get
            # the version must GATE semantics, not just shape (ADVICE r02):
            # a future same-shape change (e.g. ns→us units) bumps the
            # constant and old checkpoints fail fast here
            if _ver != 2:
                raise ValueError(
                    f"streaming_asof_carry state version {_ver} != 2 — "
                    "checkpoint written by an incompatible engine version; "
                    "restart from a fresh checkpoint directory")
        else:
            fts_ns, fval = None, None
        rows = {entity: [], "event_ts": [], "feature_ts": [], value: []}
        frames = [f for f in pdfs]
        pdf = pd.concat(frames, ignore_index=True) if frames else None
        if pdf is not None and len(pdf):
            pdf["__tag"] = (pdf[side] != "feature").astype(int)
            pdf = pdf.sort_values([ts, "__tag"], kind="mergesort")
            for r in pdf.itertuples(index=False):
                t = getattr(r, ts)
                if getattr(r, side) == "feature":
                    fts_ns = int(t.value)
                    fval = float(getattr(r, value))
                else:
                    rows[entity].append(key[0])
                    rows["event_ts"].append(t)
                    rows["feature_ts"].append(
                        pd.Timestamp(fts_ns)
                        if fts_ns is not None else pd.NaT)
                    rows[value].append(fval)
        state.update((2, fts_ns, fval))
        yield pd.DataFrame(rows)

    from pyspark.sql.streaming.state import GroupStateTimeout
    return (stream.groupBy(entity)
            .applyInPandasWithState(
                carry, outputStructType=out_schema,
                stateStructType=state_schema, outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


def streaming_asof_buffered(stream: DataFrame,
                            entity: str = "entity_id",
                            ts: str = "ts",
                            side: str = "side",
                            value: str = "fval",
                            watermark: str = "1 hour") -> DataFrame:
    """Watermark-buffered streaming as-of: exact even when FEATURES arrive
    out of order (late) across micro-batches, as long as they are within the
    watermark delay.

    Contract: an event at ts_e is emitted only once the event-time watermark
    passes ts_e. At that point every feature with feature_ts <= ts_e has
    either arrived or is permanently late (dropped by the watermark), so the
    carried value is final — the batch union_window as-of answer. Events and
    features buffer in GroupState (epoch-NANOSECOND longs — full timestamp
    resolution); an event-time timeout flushes pending events when the
    watermark advances with no new rows for the key. Events newer than the
    final watermark stay pending in state (they flush on the next run over
    the same checkpoint — tested).

    State is pruned: pending events, features newer than the watermark, and
    the single latest feature at-or-below the cutoff (the only one a future
    event can still need) — per-key state is O(out-of-orderness), not
    O(history).

    Output: one row per event — (entity, event_ts, feature_ts, value).
    """
    import numpy as np
    import pandas as pd

    out_schema = (f"{entity} string, event_ts timestamp, "
                  f"feature_ts timestamp, {value} double")
    state_schema = ("pend array<long>, fts array<long>, fvs array<double>")

    def buffered(key, pdfs, state):
        # VERDICT_r03 #5: fully vectorized — batch ingestion by boolean
        # mask, the as-of match as ONE searchsorted over the sorted
        # feature-timestamp array (no per-row itertuples/bisect loop).
        wm_ms = state.getCurrentWatermarkMs()
        wm_ns = wm_ms * 1_000_000
        if state.exists:
            pend0, fts0, fvs0 = state.get
            pend = np.asarray(pend0, dtype=np.int64)
            fts = np.asarray(fts0, dtype=np.int64)
            fvs = np.asarray(fvs0, dtype=np.float64)
        else:
            pend = np.empty(0, np.int64)
            fts = np.empty(0, np.int64)
            fvs = np.empty(0, np.float64)
        if not state.hasTimedOut:
            frames = [f for f in pdfs]
            pdf = pd.concat(frames, ignore_index=True) if frames else None
            if pdf is not None and len(pdf):
                t_ns = (pdf[ts].to_numpy("datetime64[ns]")
                        .astype(np.int64))
                is_feat = (pdf[side] == "feature").to_numpy()
                fts = np.concatenate([fts, t_ns[is_feat]])
                fvs = np.concatenate(
                    [fvs, pdf.loc[is_feat, value].to_numpy(np.float64)])
                pend = np.concatenate([pend, t_ns[~is_feat]])
        else:
            # timeout invocation: consume the iterator contract (empty)
            for _ in pdfs:
                pass
        order = np.argsort(fts, kind="stable")  # stable: equal-ts features
        fts = fts[order]                        # keep arrival order, so
        fvs = fvs[order]                        # searchsorted 'right' - 1
        pend = np.sort(pend, kind="stable")     # picks the LAST arrival
        emit_mask = pend <= wm_ns
        emit, pend = pend[emit_mask], pend[~emit_mask]
        j = np.searchsorted(fts, emit, side="right") - 1
        have = j >= 0
        jc = np.maximum(j, 0)
        if fts.size:
            f_match = fts[jc]
            v_match = fvs[jc]
        else:
            f_match = np.zeros(emit.size, np.int64)
            v_match = np.zeros(emit.size, np.float64)
        out = pd.DataFrame({
            entity: np.repeat(np.asarray(key[0], dtype=object), emit.size),
            "event_ts": emit.astype("datetime64[ns]"),
            "feature_ts": pd.Series(f_match.astype("datetime64[ns]"))
                            .mask(~have),       # NaT → NULL where no match
            value: pd.Series(v_match).mask(~have),
        })
        # prune features: keep everything a still-unseen or pending event
        # could need — all features above the cutoff plus the latest at or
        # below it (cutoff = watermark ∧ oldest pending event)
        cutoff = min(wm_ns, int(pend[0])) if pend.size else wm_ns
        keep_from = max(int(np.searchsorted(fts, cutoff, side="right")) - 1,
                        0)
        fts, fvs = fts[keep_from:], fvs[keep_from:]
        state.update((pend.tolist(), fts.tolist(), fvs.tolist()))
        if pend.size:
            # flush as soon as the watermark moves again
            state.setTimeoutTimestamp(max(wm_ms + 1, 1))
        yield out

    from pyspark.sql.streaming.state import GroupStateTimeout
    return (stream
            .withWatermark(ts, watermark)
            .groupBy(entity)
            .applyInPandasWithState(
                buffered, outputStructType=out_schema,
                stateStructType=state_schema, outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def streaming_exact_dedup(stream: DataFrame,
                          text_col: str = "text",
                          watermark_col: str | None = None,
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup — the streaming form of operators/dedup
    exact_dedup: normalize + md5 the text, keep the first arrival per hash.

    With an event-time column, dropDuplicatesWithinWatermark bounds the
    dedup state by the watermark delay (the only viable form at corpus
    scale: unbounded dropDuplicates state grows with distinct hashes
    forever). Without one, falls back to exact unbounded dedup for
    bounded backfills."""
    from clj_nlp_parse_spark.operators.dedup import norm_text_sql
    hashed = stream.withColumn(
        "text_hash", F.md5(F.expr(norm_text_sql(text_col, "spark"))))
    if watermark_col is None:
        return hashed.dropDuplicates(["text_hash"])
    return (hashed.withWatermark(watermark_col, watermark)
            .dropDuplicatesWithinWatermark(["text_hash"]))


def run_available_now(sdf: DataFrame, query_name: str,
                      output_mode: str = "append") -> None:
    """Drain all currently-available input into the memory sink."""
    q = (sdf.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()


def run_available_now_to_parquet(sdf: DataFrame, out_path: str,
                                 checkpoint: str) -> None:
    """Drain to a parquet sink with a checkpoint — the resumable form
    (the memory sink cannot recover from a checkpoint location)."""
    q = (sdf.writeStream.format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
