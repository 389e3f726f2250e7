"""Image-column plumbing: per-row invariants from BASELINE.json input_hint —
decoded-pixel fidelity (PSNR >= 40 dB for lossy), caption equality,
determinism across parallelism, zero leakage in feature materialization."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from clj_nlp_parse_spark import synth
from clj_nlp_parse_spark.operators import asof, images


def test_raw_roundtrip_lossless():
    rng = synth._rng(7)
    arr = synth.make_image(rng, 32, 24)
    dec = images.decode_image(synth.encode(arr, "raw"), 32, 24, "raw")
    assert np.array_equal(arr, dec)


def test_lossy_psnr_at_least_40db():
    for i in range(20):
        rng = synth._rng(i)
        arr = synth.make_image(rng, 40, 40)
        dec = images.decode_image(synth.encode(arr, "jpegq8"), 40, 40, "jpegq8")
        assert images.psnr(arr, dec) >= 40.0


def test_unavailable_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        images.decode_image(b"\x89PNG...", 8, 8, "png")


def test_synth_determinism_across_partitioning(spark):
    a = synth.synth_images(spark, 64, partitions=1)
    b = synth.synth_images(spark, 64, partitions=16)
    ra = {r.image_id: r for r in a.collect()}
    rb = {r.image_id: r for r in b.collect()}
    assert set(ra) == set(rb)
    for k in ra:
        assert ra[k].caption == rb[k].caption
        assert bytes(ra[k].bytes) == bytes(rb[k].bytes)
        assert ra[k].phash == rb[k].phash


def test_caption_equality_after_parquet_roundtrip(spark, tmp_path):
    df = synth.synth_images(spark, 32)
    p = str(tmp_path / "imgs")
    df.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    orig = {r.image_id: r.caption for r in df.collect()}
    rt = {r.image_id: r.caption for r in back.collect()}
    assert orig == rt


def test_image_features_and_asof_materialization(spark):
    imgs = synth.synth_images(spark, 200)
    feats = images.extract_image_features(imgs)
    rows = feats.collect()
    assert len(rows) == 200
    assert all(0 <= r.px_mean_r <= 255 for r in rows)
    # entity query events: one per entity at a mid-range timestamp
    events = (imgs.groupBy("entity_id")
              .agg(F.max("event_ts").alias("event_ts"))
              .withColumn("event_id", F.monotonically_increasing_id()))
    out = asof.asof_join(events, feats.select("entity_id", "feature_ts",
                                              "px_std", "sharpness"),
                         on=["entity_id"])
    assert asof.audit_leakage(out) == 0
    # at max(event_ts) per entity every entity has >= 1 feature → no nulls
    assert out.where(F.col("feature_ts").isNull()).count() == 0


def test_feature_extraction_deterministic_vs_local():
    # spark-free check of the numpy stats path
    rng = synth._rng(3)
    arr = synth.make_image(rng, 30, 20)
    mr, mg, mb, std, sharp = images._stats_one(arr)
    f = arr.astype(np.float64)
    assert np.isclose(mr, f[..., 0].mean())
    assert np.isclose(std, f.std())
    assert sharp > 0


def test_resize_nearest_shape():
    rng = synth._rng(11)
    arr = synth.make_image(rng, 33, 21)
    out = images.resize_nearest(arr, 16, 16)
    assert out.shape == (16, 16, 3)


def test_image_features_null_phash_contained(spark):
    # review r03: int(NaN) outside the decode try/except killed the task —
    # and a streaming query replays the poisoned micro-batch forever. A
    # NULL phash row must come through with NULL phash/bucket, decode intact.
    imgs = synth.synth_images(spark, 3, partitions=1)
    victim = imgs.first().image_id
    # force one batch-mate's phash above 2^53: a float64 round-trip (the
    # dtype a nullable long column demotes to in pandas) would corrupt it
    big = (1 << 62) + 1
    nulled = imgs.withColumn(
        "phash",
        F.when(F.col("image_id") == victim, F.lit(None).cast("long"))
         .otherwise(F.lit(big).cast("long")))
    rows = {r.image_id: r for r in
            images.extract_image_features(nulled).collect()}
    assert len(rows) == 3
    assert rows[victim].phash is None
    assert rows[victim].phash_bucket is None
    assert rows[victim].decode_ok is True          # decode unaffected
    others = [r for i, r in rows.items() if i != victim]
    # advisor r03 (high): values must be preserved EXACTLY — float64
    # precision loss turned (1<<62)+1 into (1<<62) before the fix
    assert all(r.phash == big for r in others)
    assert all(r.phash_bucket == big % 64 for r in others)


def test_image_features_phash_exact_with_synth_values(spark):
    # end-to-end: real synth phashes (which exceed 2^53) survive the Arrow
    # stage bit-exactly even when a NULL is present in the same batch
    imgs = synth.synth_images(spark, 16, partitions=1)
    orig = {r.image_id: r.phash for r in imgs.collect()}
    victim = sorted(orig)[0]
    nulled = imgs.withColumn(
        "phash", F.when(F.col("image_id") == victim,
                        F.lit(None).cast("long")).otherwise(F.col("phash")))
    got = {r.image_id: r.phash for r in
           images.extract_image_features(nulled).collect()}
    assert got[victim] is None
    for iid, ph in orig.items():
        if iid != victim:
            assert got[iid] == ph, f"phash corrupted for {iid}"


def test_resize_images_table_op(spark):
    # the DataFrame-level resize: Spark-side schema/batch plumbing is real;
    # the emitted raw bytes decode to exactly resize_nearest(decode(orig)),
    # corrupt rows yield resize_ok=false instead of failing the stage, and
    # re-runs are byte-identical (deterministic nearest-neighbor)
    import numpy as np
    imgs = synth.synth_images(spark, 20, partitions=4)
    bad = imgs.limit(1).select(
        "image_id", F.lit(b"xx").alias("bytes"), "w", "h", "fmt") \
        .withColumn("image_id", F.lit("corrupt"))
    src = imgs.select("image_id", "bytes", "w", "h", "fmt").unionByName(bad)
    out = images.resize_images(src, 16, 12).collect()
    by_id = {r.image_id: r for r in out}
    assert by_id["corrupt"].resize_ok is False
    assert by_id["corrupt"].bytes is None
    orig = {r.image_id: r for r in imgs.collect()}
    n_ok = 0
    for iid, r in by_id.items():
        if iid == "corrupt":
            continue
        assert r.resize_ok and r.w == 16 and r.h == 12 and r.fmt == "raw"
        o = orig[iid]
        want = images.resize_nearest(
            images.decode_image(o.bytes, o.w, o.h, o.fmt), 16, 12)
        got = np.frombuffer(r.bytes, dtype=np.uint8).reshape(12, 16, 3)
        assert np.array_equal(got, want)
        n_ok += 1
    assert n_ok == 20
    again = {r.image_id: r.bytes
             for r in images.resize_images(src, 16, 12).collect()}
    assert all(again[i] == by_id[i].bytes for i in by_id)


def test_video_frame_sampling(spark):
    # raw video: deterministic bytes, every_k sampling, ts from fps
    rng = np.random.default_rng(11)
    w, h, n_frames, fps = 8, 6, 25, 5
    vid = rng.integers(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("v1", bytes(vid.tobytes()), w, h, n_frames, fps, "rawvid")],
        "video_id string, bytes binary, w int, h int, n_frames int, "
        "fps int, fmt string")
    rows = sorted(images.sample_video_frames(df, every_k=10).collect(),
                  key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 10, 20]
    assert [r.ts_ms for r in rows] == [0, 2000, 4000]
    for r in rows:
        f = vid[r.frame_idx].astype(np.float64)
        assert np.isclose(r.px_mean, f.mean())
        assert np.isclose(r.px_std, f.std())


def test_video_codec_stubbed(spark):
    df = spark.createDataFrame(
        [("v1", b"\x00\x00", 8, 6, 2, 5, "mp4")],
        "video_id string, bytes binary, w int, h int, n_frames int, "
        "fps int, fmt string")
    with pytest.raises(Exception, match="NotImplementedError|video library"):
        images.sample_video_frames(df).collect()


def test_audio_features_pcm16(spark):
    sr = 8000
    t = np.arange(sr)  # 1 second
    x = (0.5 * np.sin(2 * np.pi * 440 * t / sr) * 32767).astype("<i2")
    df = spark.createDataFrame(
        [("a1", bytes(x.tobytes()), sr, "pcm16")],
        "audio_id string, bytes binary, sr int, fmt string")
    r = images.extract_audio_features(df).collect()[0]
    assert np.isclose(r.duration_s, 1.0)
    assert np.isclose(r.rms, 0.5 / np.sqrt(2), atol=1e-3)
    assert np.isclose(r.peak, 0.5, atol=1e-3)
    # 440 Hz sine: ~880 sign flips/s → ZCR ~ 880/8000
    assert np.isclose(r.zero_crossing_rate, 880 / sr, atol=1e-3)


def test_corrupt_bytes_null_policy(spark):
    # one corrupt row (truncated bytes) must not kill the stage: NULL stats
    # + decode_ok=false under the default policy; strict mode raises
    good = synth.synth_images(spark, 4).collect()
    rows = [(r.image_id, bytes(r.bytes), r.w, r.h, r.fmt, r.entity_id,
             r.event_ts, r.phash) for r in good]
    rows[2] = (rows[2][0], b"\x01\x02", rows[2][2], rows[2][3], rows[2][4],
               rows[2][5], rows[2][6], rows[2][7])  # truncated
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, "
              "entity_id string, event_ts timestamp, phash long")
    out = {r.image_id: r for r in images.extract_image_features(df).collect()}
    bad_id = rows[2][0]
    assert out[bad_id].decode_ok is False and out[bad_id].px_std is None
    assert sum(1 for r in out.values() if r.decode_ok) == 3
    assert all(r.px_std is not None for r in out.values()
               if r.image_id != bad_id)
    with pytest.raises(Exception):
        images.extract_image_features(df, on_error="raise").collect()


def test_phash_near_dup_on_image_table(spark):
    # the image-table path of the phash near-dup operator: inject bit-flip
    # variants of real synth phashes; banding must find exactly the pairs
    # within the hamming budget
    from clj_nlp_parse_spark.operators.dedup import phash_near_dup_pairs
    imgs = synth.synth_images(spark, 64).select("image_id", "phash")
    base = imgs.withColumn("phash", F.expr("phash & 4294967295"))  # 32 bits
    flip1 = base.limit(10).select(
        F.concat(F.col("image_id"), F.lit("_d1")).alias("image_id"),
        F.expr("phash ^ 4").alias("phash"))
    flip3 = base.limit(5).select(
        F.concat(F.col("image_id"), F.lit("_d3")).alias("image_id"),
        F.expr("phash ^ 21").alias("phash"))
    allv = base.unionByName(flip1).unionByName(flip3)
    pairs = phash_near_dup_pairs(allv, max_hamming=2, id_col="image_id")
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    d1 = {p for p in got if p[0].endswith("_d1") or p[1].endswith("_d1")}
    assert len(d1) >= 10   # every injected hamming-1 pair found
    # hamming-3 variants never pair with their BASE image (xor 21 = 3 bits);
    # d1↔d3 pairs of the same image are genuine (xor(4,21) = 2 bits)
    assert not any(
        (a.endswith("_d3") and b == a[:-3]) or
        (b.endswith("_d3") and a == b[:-3])
        for a, b in got)
    assert all(h <= 2 for h in got.values())
