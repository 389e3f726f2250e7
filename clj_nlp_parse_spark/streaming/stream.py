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


def run_available_now(sdf: DataFrame, query_name: str,
                      output_mode: str = "append") -> None:
    """Drain all currently-available input into the memory sink."""
    q = (sdf.writeStream.format("memory").queryName(query_name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
