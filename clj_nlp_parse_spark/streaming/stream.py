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
    holds the latest (feature_ts, value) seen; each micro-batch is sorted
    by (ts, side-tag) in pandas (features before events at equal ts →
    inclusive), events emit the carried feature, and the state persists
    across batches/restarts via the checkpoint. Exact when features are
    not late relative to the events they serve (the standard feed order);
    late features would need a watermark-buffered variant.

    Output: one row per event — (entity, event_ts, feature_ts, value).
    """
    import pandas as pd

    out_schema = (f"{entity} string, event_ts timestamp, "
                  f"feature_ts timestamp, {value} double")
    state_schema = "fts_ms long, fval double"

    def carry(key, pdfs, state):
        from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: F401
        if state.exists:
            fts_ms, fval = state.get
        else:
            fts_ms, fval = None, None
        rows = {entity: [], "event_ts": [], "feature_ts": [], value: []}
        for pdf in pdfs:
            pdf = pdf.copy()
            pdf["__tag"] = (pdf[side] != "feature").astype(int)
            pdf = pdf.sort_values([ts, "__tag"], kind="mergesort")
            for r in pdf.itertuples(index=False):
                t = getattr(r, ts)
                if getattr(r, side) == "feature":
                    fts_ms = int(t.value // 10**6)  # ns → ms
                    fval = float(getattr(r, value))
                else:
                    rows[entity].append(key[0])
                    rows["event_ts"].append(t)
                    rows["feature_ts"].append(
                        pd.Timestamp(fts_ms, unit="ms")
                        if fts_ms is not None else pd.NaT)
                    rows[value].append(fval)
        state.update((fts_ms, fval))
        yield pd.DataFrame(rows)

    from pyspark.sql.streaming.state import GroupStateTimeout
    return (stream.groupBy(entity)
            .applyInPandasWithState(
                carry, outputStructType=out_schema,
                stateStructType=state_schema, outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))


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
