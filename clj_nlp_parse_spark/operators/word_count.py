"""Word-count featurizer — the reference's train/apply ML-feature path
(SURVEY.md §2.5 F7-F12, §3.3).

TRAIN (fit): per class label, bag-of-words counts of go-word forms
(reference calculate-words-by-label, word_count.clj:40-52) → top-N words by
count desc (N = words_by_label_count, default 3; deterministic tiebreak:
word asc — the reference's tie order is map-iteration-dependent, the engine
pins it, SURVEY.md §7 risks) → normalize by the top-N sum
(calculate-word-count-dist, word_count.clj:19-38).

SCORE (transform): for each doc, per label, Σ P(word|label) over ALL token
forms (not just go words — mirrors label-word-count-scores,
word_count.clj:67-77 which maps pt/tokens unfiltered); missing word → 0.

Exactness contract: the score is computed as (Σ integer counts)/label_total
with ONE final division, so the result is bit-identical in any engine and
any summation order — the distributed analog of the reference's exact
rationals (3/17, 9/17, 5/17 — word_count_test.clj:33-36).

Scale: fit is two hash aggregations on (label, word) — partial+final combine,
tiny output (N×|labels| rows) collected and rebroadcast as literal maps;
transform is a pure Catalyst projection (no join, no shuffle, no Python).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from clj_nlp_parse_spark.functions import text as tx


@dataclass
class WordCountModel:
    """Fitted stats: {label: {word: count}} over top-N + per-label top-N
    total. P(word|label) = counts[label][word] / totals[label]."""
    counts: dict[str, dict[str, int]]
    totals: dict[str, int]
    form: str = "word"

    @property
    def dist(self) -> dict[str, dict[str, float]]:
        return {lab: {w: c / self.totals[lab] for w, c in ws.items()}
                for lab, ws in self.counts.items()}

    def labels(self) -> list[str]:
        return sorted(self.counts)


@dataclass
class WordCountFeaturizer:
    """fit/transform estimator (the Spark shape of calculate-feature-stats,
    word_count.clj:54-62)."""
    words_by_label_count: int = 3
    form: str = "word"           # go-word-form: 'word' (lower text) or 'lemma'
    label_col: str = "label"
    text_col: str = "text"

    def fit(self, df: DataFrame) -> WordCountModel:
        # r6: go forms straight from the word array — the full annotate()
        # struct computed POS+lemma+3 flags per token this path never read
        ann = df.withColumn("words", tx.words_col(self.text_col))
        gw = ann.select(
            F.col(self.label_col).alias("label"),
            F.explode(F.expr(tx.go_word_forms_from_words_sql(
                "words", self.form))).alias("word"),
        )
        counts = gw.groupBy("label", "word").agg(F.count("*").alias("c"))
        w = Window.partitionBy("label").orderBy(F.desc("c"), F.asc("word"))
        topn = (counts.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= self.words_by_label_count)
                .select("label", "word", "c"))
        rows = topn.collect()  # ≤ N × |labels| rows — driver-safe at any scale
        cmap: dict[str, dict[str, int]] = {}
        for r in rows:
            cmap.setdefault(r.label, {})[r.word] = r.c
        totals = {lab: sum(ws.values()) for lab, ws in cmap.items()}
        return WordCountModel(cmap, totals, self.form)

    def transform(self, df: DataFrame, model: WordCountModel,
                  id_col: str = "doc_id") -> DataFrame:
        """Wide output: word_count_<label> double columns (F10 shape,
        label-count-score-features, word_count.clj:79-92)."""
        # r6: scoring reads ALL token forms — for form='word' that IS the
        # word array; for 'lemma' only the lemma CASE is needed. The old
        # annotate() computed the full 7-field struct per token.
        ann = df.withColumn("words", tx.words_col(self.text_col))
        if model.form == "word":
            forms = F.col("words")
        else:
            from clj_nlp_parse_spark import dialect
            lemma = dialect.lemma_case_expr("gwt", "spark")
            forms = F.expr(f"transform(words, gwt -> ({lemma}))")
        out_cols = [F.col(id_col)]
        tmp = ann.withColumn("__forms", forms)
        for lab in model.labels():
            ws = model.counts[lab]
            total = model.totals[lab]
            kv = ", ".join(
                f"'{w.replace(chr(39), chr(39)*2)}', {c}L" for w, c in ws.items())
            score = F.expr(
                f"aggregate(__forms, 0L, (a, t) -> "
                f"a + coalesce(element_at(map({kv}), t), 0L))"
            ).cast("double") / F.lit(float(total))
            out_cols.append(score.alias(f"word_count_{lab}"))
        return tmp.select(*out_cols)

    def top_count_scores(self, df: DataFrame, model: WordCountModel,
                         num_counts: int, id_col: str = "doc_id") -> DataFrame:
        """F11 top-count-scores (word_count.clj:103-117): per doc, top-k
        labels by score desc (score > 0 only). Tiebreak: label asc."""
        wide = self.transform(df, model, id_col)
        labs = model.labels()
        stack = ", ".join(
            f"'{lab}', word_count_{lab}" for lab in labs)
        long = wide.select(
            id_col,
            F.expr(f"stack({len(labs)}, {stack}) AS (label, score)"))
        w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
        return (long.where(F.col("score") > 0)
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= num_counts)
                .select(id_col, "label", "score", "rn"))


# ------------------------------------------------------------ Python twins
# INDEPENDENT pure-Python featurizer (dict/list arithmetic, no DataFrames,
# no SQL rendering) — third comparator for the F7-F12 word-count surface
# beyond the moby.txt reference golden; fuzz-asserted in
# tests/test_fuzz_parity.py. Token/POS/lemma primitives come from
# dialect's Python twins, themselves parity-pinned against the SQL CASE
# rules in tests/test_dialect_parity.py.

import re as _re

from clj_nlp_parse_spark import dialect as _dl
from clj_nlp_parse_spark import schema as _schema


def go_forms_py(text: str | None, form: str = "word") -> list[str]:
    """Twin of go_word_forms_col over one text: canonical forms of the
    go words (non-stopword, go-POS), in token order."""
    out = []
    for t in _re.findall(_dl.TOKEN_RE, (text or "").lower()):
        if t in _schema.STOPWORDS:
            continue
        if _dl.pos_py(t) not in _schema.GO_POS_TAGS:
            continue
        out.append(t if form == "word" else _dl.lemma_py(t))
    return out


def fit_py(docs: list[tuple], words_by_label_count: int = 3,
           form: str = "word") -> "WordCountModel":
    """Twin of WordCountFeaturizer.fit over [(label, text)]: top-N words
    per label by (count desc, word asc)."""
    counts: dict[str, dict[str, int]] = {}
    for label, text in docs:
        for w in go_forms_py(text, form):
            lab = counts.setdefault(label, {})
            lab[w] = lab.get(w, 0) + 1
    cmap = {}
    for label, ws in counts.items():
        top = sorted(ws.items(), key=lambda kv: (-kv[1], kv[0]))
        cmap[label] = dict(top[:words_by_label_count])
    totals = {lab: sum(ws.values()) for lab, ws in cmap.items()}
    return WordCountModel(cmap, totals, form)


def scores_py(docs: list[tuple], model: "WordCountModel") -> dict:
    """Twin of WordCountFeaturizer.transform over [(id, text)]:
    {id: {label: score}} with the same long-sum / double-total division."""
    out = {}
    for doc_id, text in docs:
        forms = [t if model.form == "word" else _dl.lemma_py(t)
                 for t in _re.findall(_dl.TOKEN_RE, (text or "").lower())]
        row = {}
        for lab in model.labels():
            s = sum(model.counts[lab].get(t, 0) for t in forms)
            row[lab] = float(s) / float(model.totals[lab])
        out[doc_id] = row
    return out


def top_count_scores_py(docs: list[tuple], model: "WordCountModel",
                        num_counts: int) -> list[tuple]:
    """Twin of top_count_scores: (id, label, score, rank) rows, score > 0
    only, ranked by (score desc, label asc)."""
    out = []
    for doc_id, row in scores_py(docs, model).items():
        ranked = sorted(((lab, sc) for lab, sc in row.items() if sc > 0),
                        key=lambda kv: (-kv[1], kv[0]))
        out += [(doc_id, lab, sc, r + 1)
                for r, (lab, sc) in enumerate(ranked[:num_counts])]
    return out
