"""Regenerate the committed image-stats golden fixture
(fixtures/image_stats_2000.parquet) — VERDICT_r03 #3.

The flagship query `image_feature_materialization` re-materializes the
same per-image stats every run (synth → decode → pixel stats, all
seed-fixed and deterministic) and as-of joins them; its DuckDB oracle
reads THIS committed fixture. If the decode or stats code ever changes
behavior, the Spark side diverges from the fixture and the driver's
value-hash gate goes red — i.e. the fixture is the golden, the gate is
the diff. Regenerate (and review the diff!) only when a stats-path
change is intentional:

    python tools/make_image_stats.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from clj_nlp_parse_spark import synth
from clj_nlp_parse_spark.operators import images
from clj_nlp_parse_spark.session import get_spark

N = 2000  # the driver's correctness gate runs at sf0.01 → n=2000
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "image_stats_2000.parquet")


def main():
    spark = get_spark(app_name="make_image_stats", parallelism=8,
                      shuffle_partitions=8)
    imgs = synth.synth_images(spark, N)
    pdf = (images.extract_image_features(imgs)
           .where("decode_ok")
           .select("image_id", "entity_id", "feature_ts",
                   "px_mean_r", "px_std", "sharpness")
           .toPandas()
           .sort_values("image_id")
           .reset_index(drop=True))
    assert len(pdf) == N, f"expected {N} decoded rows, got {len(pdf)}"
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), OUT)
    print(f"wrote {len(pdf)} rows -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
