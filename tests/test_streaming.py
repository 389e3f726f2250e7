"""Structured Streaming: session windows, watermarked aggregation, and
stateless caption features over a file-source stream — results must equal
the batch operators on the same input."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from clj_nlp_parse_spark.streaming import stream as ST


def _t(s):
    return dt.datetime.fromisoformat(s)


def _write_events(spark, tmp_path):
    rows = [
        (1, 1, _t("2025-01-01T10:00:00"), 1.0),
        (2, 1, _t("2025-01-01T10:10:00"), 2.0),
        (3, 1, _t("2025-01-01T11:30:00"), 3.0),  # 80-min gap → new session
        (4, 2, _t("2025-01-01T10:05:00"), 4.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    p = str(tmp_path / "ev")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    return p, df


def test_streaming_session_window_matches_batch_sessionize(spark, tmp_path):
    p, batch = _write_events(spark, tmp_path)
    sdf = spark.readStream.schema(batch.schema).parquet(p)
    out = ST.session_aggregate(sdf, gap="30 minutes")
    ST.run_available_now(out, "sess_t", output_mode="complete")
    got = {(r.user_id, r.n_events)
           for r in spark.sql("SELECT * FROM sess_t").collect()}
    # user 1: sessions {2 events}, {1 event}; user 2: {1 event}
    assert got == {(1, 2), (1, 1), (2, 1)}
    # batch equivalent agrees on session count per user
    from clj_nlp_parse_spark.operators import windows
    b = windows.sessionize(batch, gap_seconds=1800)
    bs = (b.groupBy("user_id").agg(F.countDistinct("session_id").alias("n"))
          .collect())
    assert {(r.user_id, r.n) for r in bs} == {(1, 2), (2, 1)}


def test_streaming_windowed_counts(spark, tmp_path):
    p, batch = _write_events(spark, tmp_path)
    sdf = spark.readStream.schema(batch.schema).parquet(p)
    out = ST.windowed_event_counts(sdf, window="1 hour")
    ST.run_available_now(out, "winc_t", output_mode="complete")
    got = {(r.user_id, r.win_start.hour, r.n_events)
           for r in spark.sql("SELECT * FROM winc_t").collect()}
    assert (1, 10, 2) in got and (1, 11, 1) in got and (2, 10, 1) in got


def test_streaming_caption_features_match_batch(spark, tmp_path):
    rows = [("a", "the fast cats are running"), ("b", "slow table scan")]
    df = spark.createDataFrame(rows, "image_id string, caption string")
    p = str(tmp_path / "caps")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    sdf = spark.readStream.schema(df.schema).parquet(p)
    out = ST.streaming_caption_features(sdf).select(
        "image_id", "pos_tag_count_noun", "pos_tag_count_verb")
    ST.run_available_now(out, "capf_t")
    got = {r.image_id: (r.pos_tag_count_noun, r.pos_tag_count_verb)
           for r in spark.sql("SELECT * FROM capf_t").collect()}
    batch = ST.streaming_caption_features(df).select(
        "image_id", "pos_tag_count_noun", "pos_tag_count_verb")
    want = {r.image_id: (r.pos_tag_count_noun, r.pos_tag_count_verb)
            for r in batch.collect()}
    assert got == want
