"""A12 coref-shaped chains — the reference's coreference structure
(stanford.clj:407-421 coref-tree-to-map, component config.clj:200-204,
annotation shape doc/annotation-definitions.md:22-41) re-expressed as a
deterministic per-document clustering, per the A6/A8/A9 shape-graft
precedent: the STRUCTURE (chains of mentions in textual order, each
mention carrying sent-index / token-range / head-index / chain id) is real
and consumable by downstream features; the neural mention-ranking model is
replaced by a documented deterministic rule.

The graft contract (each rule hand-checkable against the reference shape):
  - mention source: the model-side (gazetteer) NER mentions per sentence
    (ner.py run-merging — CoreNLP's coref consumes entity mentions too)
  - clustering rule: two mentions corefer iff their LEMMA-NORMALIZED
    texts match exactly (exact text/lemma match — the deterministic core
    of CoreNLP's deterministic-sieve "exact match" pass)
  - a chain = a key with >= 2 mentions in the document; singletons are
    not chains (CoreNLP drops singleton clusters from getCorefChains)
  - chain_id: 1-based rank of the key in sorted key order within the doc
    (dense and deterministic, like the reference's stable :id per chain)
  - mentions listed in TEXTUAL ORDER (the reference's
    getMentionsInTextualOrder)
  - sent_index: 0-based (reference :sent-index)
  - token_beg/token_end: 1-based sentence token range [start, end) —
    the reference's :token-range convention for coref mentions
  - head_index: the mention's LAST token, 1-based (rightmost-headed
    noun compounds — the deterministic stand-in for :head-index)

Scale shape: clustering is PER-DOCUMENT by definition, so the whole
operator compiles to ONE Catalyst projection over let-bound arrays —
zero shuffle, zero Python. The O(m^2) key counting is bounded by
mentions-per-doc, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from clj_nlp_parse_spark import dialect
from clj_nlp_parse_spark.operators import ner
from clj_nlp_parse_spark.operators.features import sentence_words_sql
from clj_nlp_parse_spark.operators.trees import _spark_let


def mention_key_sql(ws: str, m: str, d: str = "spark") -> str:
    """Chain clustering key: lemma-joined mention words. `ws` = bound
    sentence word-array name, `m` = bound mention struct name (tok_beg
    0-based, tok_end exclusive — the ner.py mention shape)."""
    lem = dialect.lemma_case_expr("w", d)
    if d == "spark":
        return (f"array_join(transform(slice({ws}, {m}.tok_beg + 1, "
                f"{m}.tok_end - {m}.tok_beg), w -> {lem}), ' ')")
    return (f"array_to_string(list_transform({ws}[{m}.tok_beg + 1:"
            f"{m}.tok_end], w -> {lem}), ' ')")


def _sentence_mentions_spark(si: str, ws: str) -> str:
    """Mention structs (sent_index, label, tok_beg, tok_end, key) for one
    sentence. `si` = 1-based sentence index expr, `ws` = word-array expr;
    the type array is let-bound once (HOF free-var re-eval guard)."""
    body = (f"transform({ner.ner_mentions_sql('m0.ty', 'spark')}, m -> "
            f"named_struct("
            f"'sent_index', {si} - 1, 'label', m.label, "
            f"'tok_beg', m.tok_beg, 'tok_end', m.tok_end, "
            f"'key', {mention_key_sql('m0.ws', 'm', 'spark')}))")
    return _spark_let(
        {"ws": ws, "ty": ner.token_types_sql(ws, "spark")}, body, "m0")


def doc_mentions_spark(sents: str) -> str:
    """All mentions of a doc in textual order, from a bound per-sentence
    word-arrays name. sequence(1, 0) is DESCENDING in Spark — the empty
    guard is load-bearing."""
    seq = (f"CASE WHEN size({sents}) = 0 THEN array() "
           f"ELSE sequence(1, size({sents})) END")
    one = _sentence_mentions_spark("si", f"try_element_at({sents}, si)")
    return f"flatten(transform({seq}, si -> {one}))"


def coref_expr(text_col: str) -> str:
    """Spark expression: text -> per-doc coref array (the reference's
    coref annotation as a typed column):
    array<struct<chain_id, mention_key, label, sent_index, token_beg,
    token_end, head_index, chain_size>>, mentions in textual order."""
    allm = doc_mentions_spark("c0.sents")
    # per-key counts computed ONCE over the sorted distinct keys
    # (review r04: counting inside the per-mention emission was O(m^2)
    # in mentions — one 10k-mention doc took 20.8 s; this O(d*m) form,
    # d = distinct keys, runs it in <1 s and is corpus-independent)
    counts = (f"transform(k0.dkeys, k -> "
              f"size(filter(k0.allm, m -> m.key = k)))")
    qkeys = (f"transform(filter(CASE WHEN size(k1.dkeys) = 0 THEN array() "
             f"ELSE sequence(1, size(k1.dkeys)) END, i -> "
             f"try_element_at(k1.counts, i) >= 2), i -> "
             f"try_element_at(k1.dkeys, i))")
    row = (f"named_struct("
           f"'chain_id', array_position(k2.qkeys, m.key), "
           f"'mention_key', m.key, 'label', m.label, "
           f"'sent_index', cast(m.sent_index as bigint), "
           f"'token_beg', cast(m.tok_beg + 1 as bigint), "
           f"'token_end', cast(m.tok_end + 1 as bigint), "
           f"'head_index', cast(m.tok_end as bigint), "
           f"'chain_size', cast(try_element_at(k2.counts, "
           f"cast(array_position(k2.dkeys, m.key) as int)) as bigint))")
    body = (f"transform(filter(k2.allm, m -> "
            f"array_contains(k2.qkeys, m.key)), m -> {row})")
    l_k2 = _spark_let(
        {"allm": "k1.allm", "dkeys": "k1.dkeys", "counts": "k1.counts",
         "qkeys": qkeys}, body, "k2")
    l_k1 = _spark_let(
        {"allm": "k0.allm", "dkeys": "k0.dkeys", "counts": counts},
        l_k2, "k1")
    l_k0 = _spark_let(
        {"allm": "y.allm",
         "dkeys": "array_sort(array_distinct("
                  "transform(y.allm, m -> m.key)))"},
        l_k1, "k0")
    l_y = _spark_let({"allm": allm}, l_k0, "y")
    return _spark_let({"sents": sentence_words_sql(text_col, "spark")},
                      l_y, "c0")


def add_coref(df: DataFrame, text_col: str = "text",
              out_col: str = "coref") -> DataFrame:
    """Attach the coref chain-mention array to any frame with a text
    column — one projection, composes with every other annotator."""
    return df.withColumn(out_col, F.expr(coref_expr(text_col)))


def duck_coref_cte(from_tbl: str, text_col: str = "text") -> str:
    """DuckDB CTE chain (no leading WITH) ending in `cm`: one row per
    chain mention with doc_id, chain_id, key, label, sent_index, tok_beg,
    tok_end (0-based, ner shape), chain_size — and `cch` (doc_id, key,
    chain_size) for per-doc aggregation. Same rule tables as the Spark
    side (dense_rank over sorted keys == array_position in the sorted
    qualifying key array)."""
    sents = sentence_words_sql(text_col, "duck")
    ty = ner.token_types_sql("ws", "duck")
    ments = ner.ner_mentions_sql("ty", "duck")
    key = mention_key_sql("ws", "m", "duck")
    return f"""
cs0 AS (SELECT doc_id, {sents} AS sents FROM {from_tbl}),
cs1 AS (SELECT doc_id, unnest(list_transform(range(1, len(sents) + 1),
          i -> struct_pack(si := i, ws := sents[i]))) AS sx FROM cs0),
cs2 AS (SELECT doc_id, sx.si AS si, sx.ws AS ws, {ty} AS ty FROM cs1),
cs3 AS (SELECT doc_id, si, ws, unnest({ments}) AS m FROM cs2),
cs4 AS (SELECT doc_id, si - 1 AS sent_index, m.label AS label,
               m.tok_beg AS tok_beg, m.tok_end AS tok_end,
               {key} AS key FROM cs3),
cch AS (SELECT doc_id, key, COUNT(*) AS chain_size FROM cs4
        GROUP BY doc_id, key HAVING COUNT(*) >= 2),
cid AS (SELECT doc_id, key, chain_size,
               dense_rank() OVER (PARTITION BY doc_id ORDER BY key)
                 AS chain_id FROM cch),
cm AS (SELECT cs4.doc_id AS doc_id, chain_id, key, label, sent_index,
              tok_beg, tok_end, chain_size
       FROM cs4 JOIN cid USING (doc_id, key))"""
