"""Benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "rows_per_sec": ...}

Timing uses the noop sink so the full plan executes (count() would let
Catalyst prune the feature projections away).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_SYNTH_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "4000"))

HEADLINE = [
    "pos_features", "doc_stats", "sentiment_features", "go_words",
    "word_count_scores", "dict_mentions", "mention_features",
    "asof_join", "asof_join_merge", "asof_join_forward", "asof_join_nearest", "asof_incremental",
    "asof_join_tolerance", "lag_lead", "sessionize", "backfill",
    "srl_features", "token_positional", "mention_union",
    "model_mentions", "mention_features_union",
    "dedup_exact", "minhash_signatures", "lsh_pairs", "simhash",
    # scale-path variants only: jaccard_pairs / similarity_topk stay
    # registered as oracle baselines but are not headline (VERDICT r01 #6)
    "jaccard_pairs_prefix", "ivf_topk",
    "text_stats", "dict_mentions_options",
    "dedup_groups", "image_dedup_groups", "embedding_dedup_groups",
    "decontaminate", "curation_pipeline", "curation_incremental",
    "stratified_sample", "pii_scrub", "repetition_stats",
    "corpus_profile", "sequence_packing", "np_vp_chunks",
    "parse_tree_edges", "dep_tree_edges",
    "coref_chains", "coref_features", "natlog_tokens", "natlog_features",
    "srl_tokens", "cosine_dedup_banded", "cosine_dedup_banded_derived",
    "lm_perplexity",
    # corpus_mix stays registered as the exact-rank oracle baseline; the
    # zero-shuffle hash-threshold variant is the headline scale path
    "corpus_mix_consistent", "passage_dedup", "passage_dedup_incremental",
    "leakage_safe_split", "token_budget_select", "token_budget_mix",
    # image_feature_materialization is NOT in this loop: its REGISTERED
    # form (synth → decode → materialize-to-parquet → read-back → as-of)
    # is timed separately below as *_query, while the dedicated flagship
    # section keeps the r01-comparable core computation under the
    # historical key (input persisted untimed + warm-up)
]


def run_noop(df) -> int:
    n = df.count()
    df.write.format("noop").mode("overwrite").save()
    return n


def control_sec(spark) -> float:
    """Host-speed control (VERDICT_r02 #5): a FROZEN, SF-independent
    workload (md5 + hash-agg over a generated range) timed as the median of
    3 runs. Cross-round bench totals divide by this to separate engine
    regressions from sandbox-host slowdown (round 2 measured a ~1.46x host
    drift that needed manual archaeology to explain). DO NOT change this
    workload — comparability across rounds depends on it being
    byte-identical."""
    from pyspark.sql import functions as F

    def once() -> float:
        t0 = time.perf_counter()
        (spark.range(0, 20_000_000, 1, CPUS)
         .select((F.col("id") % 9973).alias("k"),
                 F.md5(F.col("id").cast("string")).alias("h"))
         .groupBy("k").agg(F.count("*").alias("n"), F.max("h").alias("m"))
         .write.format("noop").mode("overwrite").save())
        return time.perf_counter() - t0

    once()  # warm-up (excluded)
    return round(sorted(once() for _ in range(3))[1], 3)


def main() -> None:
    from clj_nlp_parse_spark import queries as Q
    from clj_nlp_parse_spark import synth
    from clj_nlp_parse_spark.operators import asof, images
    from clj_nlp_parse_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="bench", parallelism=CPUS,
                      shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    total_rows = 0

    # warm the JVM + parquet footers once (excluded from timings)
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    ctl = control_sec(spark)

    for name in HEADLINE:
        fn = Q.QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # the registered flagship query end-to-end (review r04: the section
    # below times the r01-comparable CORE computation, which no longer
    # covers the query's materialize/read-back/pre-agg steps)
    t0 = time.perf_counter()
    (Q.QUERIES["image_feature_materialization"](spark, SF_DIR)
     .write.format("noop").mode("overwrite").save())
    timings["image_feature_materialization_query"] = round(
        time.perf_counter() - t0, 3)

    # flagship: image+caption as-of feature materialization (north_rule).
    # The input table is persisted UNTIMED (it exists on disk in production;
    # synthesizing it is not part of the materialization) and a warm-up run
    # absorbs one-time Python-worker spin-up, as in tools/bench_scaling.py.
    imgs = synth.synth_images(spark, N_SYNTH_IMAGES, partitions=CPUS).cache()
    imgs.count()

    def flagship():
        feats = images.extract_image_features(imgs)
        events = (imgs.select("entity_id", "event_ts")
                  .withColumn("event_id", F.xxhash64("entity_id", "event_ts")))
        out = asof.asof_join(
            events, feats.select("entity_id", "feature_ts", "px_mean_r",
                                 "px_mean_g", "px_mean_b", "px_std",
                                 "sharpness"),
            on=["entity_id"])
        return out.count()

    flagship()  # warm-up (excluded)
    t0 = time.perf_counter()
    n_flagship = flagship()
    timings["image_feature_materialization"] = round(
        time.perf_counter() - t0, 3)
    total_rows += n_flagship
    imgs.unpersist()

    total = round(sum(timings.values()), 3)
    flag_t = timings["image_feature_materialization"]
    print(json.dumps({
        "metric": "headline queries total wall time (sf0.1) + image as-of "
                  "feature materialization",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "control_sec": ctl,
        "flagship_feature_rows_per_sec": round(n_flagship / flag_t, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
