"""Pipeline composition + config DSL — the engine's public composable API.

Mirrors the reference's dataflow composition (SURVEY.md §2.2):
  P1/P2 pipeline reduce (parse.clj:125-130, stanford.clj:494-516)
        → ordered fold of DataFrame transforms
  P3 component factory/registry (register-library, config.clj:226-244)
        → REGISTRY dict {name: factory(args) -> transform}
  P4 config DSL "tokenize(en),sentence,part-of-speech"
        (config_parse.clj:41-132) → parse_pipeline_string with the same
        structured error semantics: unparsable string → ValueError with
        position; unknown component → "No such component".

Every transform is DataFrame -> DataFrame; Catalyst fuses adjacent
projections, so an N-stage pipeline costs one pass (unlike the reference's
N sequential annotator mutations).
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transform = Callable[[DataFrame], DataFrame]
Factory = Callable[..., Transform]

REGISTRY: dict[str, Factory] = {}


def register_component(name: str):
    """P3: plugin registry — the engine's register-library analog."""
    def deco(factory: Factory) -> Factory:
        REGISTRY[name] = factory
        return factory
    return deco


_COMP_RE = re.compile(r"\s*([a-zA-Z][\w-]*)\s*(?:\(([^)]*)\))?\s*$")


def parse_pipeline_string(spec: str) -> list[tuple[str, list[str]]]:
    """P4: 'tokenize(en),stopword,pos-features' → [(name, args), ...].

    Errors mirror the reference (config_parse.clj:83-88,107-115):
    unparsable → ValueError naming the bad segment + its position;
    unknown component → ValueError 'No such component: <name>'.
    """
    out: list[tuple[str, list[str]]] = []
    pos = 0
    for seg in spec.split(","):
        if not seg.strip():
            raise ValueError(f"could not parse pipeline at position {pos}: "
                             f"empty component in {spec!r}")
        m = _COMP_RE.match(seg)
        if not m:
            raise ValueError(
                f"could not parse pipeline at position {pos}: {seg!r}")
        name, argstr = m.group(1), m.group(2)
        args = [a.strip() for a in argstr.split(",")] if argstr else []
        if name not in REGISTRY:
            raise ValueError(f"No such component: {name}")
        out.append((name, args))
        pos += len(seg) + 1
    return out


@dataclass
class FeaturePipeline:
    """P1/P2: ordered fold of registered transforms."""
    stages: list[tuple[str, list[str]]]

    @classmethod
    def from_string(cls, spec: str) -> "FeaturePipeline":
        return cls(parse_pipeline_string(spec))

    def transform(self, df: DataFrame) -> DataFrame:
        for name, args in self.stages:
            df = REGISTRY[name](*args)(df)
        return df


# ---------------------------------------------------------------- components
@register_component("tokenize")
def _tokenize(lang: str = "en") -> Transform:
    from clj_nlp_parse_spark.functions import text as tx
    if lang not in ("en",):
        raise ValueError(f"unsupported tokenize language: {lang}")
    return lambda df: tx.annotate(df, "text")


@register_component("stopword")
def _stopword() -> Transform:
    # annotate() already computes is_stop; this stage projects go-word forms
    from clj_nlp_parse_spark.functions import text as tx
    return lambda df: df.withColumn("go_words", tx.go_word_forms_col("toks"))


@register_component("pos-features")
def _pos_features() -> Transform:
    from clj_nlp_parse_spark.operators.features import pos_tag_feature_cols
    return lambda df: df.select("*", *pos_tag_feature_cols("toks"))


@register_component("doc-stats")
def _doc_stats() -> Transform:
    from clj_nlp_parse_spark.operators.features import token_feature_cols
    return lambda df: df.select("*", *token_feature_cols("text", "toks"))


@register_component("sentiment")
def _sentiment() -> Transform:
    # pure projection — the component appends columns in place; joining a
    # projected copy back on the key would be an avoidable shuffle
    from clj_nlp_parse_spark.operators.features import with_sentiment_features
    return lambda df: with_sentiment_features(df, "text")


@register_component("text-stats")
def _text_stats() -> Transform:
    from clj_nlp_parse_spark.operators.textstats import with_text_stats
    return lambda df: with_text_stats(df, "text")
