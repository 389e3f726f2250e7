"""Dictionary / token-regex NER (A7) + mention queries (O4-O10) + F5.

The reference compiles dictionary items into CoreNLP TokensRegex rule files
(tok_re.clj:44-71,112-191) and tags matching token spans in-process. The
engine compiles the same item model into Catalyst higher-order expressions:
for a k-word phrase, candidate start positions are
`filter(sequence(1, n-k+1), i -> words[i] = w1 AND ... )` — pure JVM,
whole-stage codegen, zero Python. Matches are ALL start positions
(overlaps allowed) — a deterministic, SQL-checkable contract.

Item options mirrored from the reference (tok_re.clj:29-42,116-135):
  first_det_chop  — drop a leading 'the' from the phrase   (default True)
  lem_min_len     — if != -1 and len(content) >= it, match the LAST token
                    on lemma instead of word                (default -1)
  case_min_tok    — case sensitivity is not representable in the lowercase
                    Catalyst token path; handled by the full parser
                    (functions/parse.py) only.

F5 mentions-features (feature/lang.clj:193-237): count + ratio per entity
type, zero defaults for the full entity vocabulary, ratio = count/token_count
with 0-if-empty guard.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clj_nlp_parse_spark import dialect
from clj_nlp_parse_spark.functions import text as tx


@dataclass
class DictItem:
    item_id: int
    content: str
    label: str
    features: dict[str, str] = field(default_factory=dict)
    lem_min_len: int = -1
    case_min_tok: int = -1
    first_det_chop: bool = True
    is_regexp: bool = False


@dataclass
class CompiledItem:
    item_id: int
    label: str
    features: dict[str, str]
    # (field, word) per position: field is 'word' or 'lemma'
    pattern: list[tuple[str, str]]


def compile_items(items: list[DictItem]) -> list[CompiledItem]:
    out = []
    for it in items:
        if it.is_regexp:
            raise NotImplementedError(
                "verbatim-regex items are handled by the full parser only")
        toks = it.content.split()
        if it.first_det_chop and toks and toks[0].lower() == "the":
            toks = toks[1:]
        if not toks:
            continue
        lem = it.lem_min_len != -1 and len(it.content) >= it.lem_min_len
        pattern = []
        for i, t in enumerate(toks):
            last = i == len(toks) - 1
            field_ = "lemma" if (lem and last) else "word"
            w = t.lower()
            pattern.append((field_, dialect.lemma_py(w) if field_ == "lemma" else w))
        out.append(CompiledItem(it.item_id, it.label, dict(it.features), pattern))
    return out


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def match_positions_sql(ci: CompiledItem, words: str, lemmas: str,
                        dialect_name: str = "spark") -> str:
    """SQL array of 1-based start positions where the item matches."""
    k = len(ci.pattern)
    conds = []
    for off, (fld, w) in enumerate(ci.pattern):
        arr = words if fld == "word" else lemmas
        if dialect_name == "spark":
            conds.append(f"try_element_at({arr}, i + {off}) = {_q(w)}")
        else:
            conds.append(f"{arr}[i + {off}] = {_q(w)}")
    cond = " AND ".join(conds)
    if dialect_name == "spark":
        return (f"CASE WHEN size({words}) >= {k} THEN "
                f"filter(sequence(1, size({words}) - {k} + 1), i -> {cond}) "
                f"ELSE array() END")
    return (f"CASE WHEN len({words}) >= {k} THEN "
            f"list_filter(range(1, len({words}) - {k} + 2), i -> {cond}) "
            f"ELSE [] END")


def mentions_sql(compiled: list[CompiledItem], words: str, lemmas: str,
                 dialect_name: str = "spark") -> str:
    """SQL for tok_re_mentions: array<struct<label,item_id,tok_beg,tok_end>>
    — flattened over all items, ALL matching start positions."""
    parts = []
    for ci in compiled:
        k = len(ci.pattern)
        pos = match_positions_sql(ci, words, lemmas, dialect_name)
        if dialect_name == "spark":
            parts.append(
                f"transform({pos}, i -> named_struct("
                f"'label', {_q(ci.label)}, 'item_id', {ci.item_id}L, "
                f"'tok_beg', i - 1, 'tok_end', i - 1 + {k}))")
        else:
            parts.append(
                f"list_transform({pos}, i -> struct_pack("
                f"label := {_q(ci.label)}, item_id := {ci.item_id}::BIGINT, "
                f"tok_beg := i - 1, tok_end := i - 1 + {k}))")
    if not parts:
        return "array()" if dialect_name == "spark" else "[]"
    if dialect_name == "spark":
        return "concat(" + ", ".join(parts) + ")"
    return "(" + " || ".join(parts) + ")"


def tag_mentions(df: DataFrame, items: list[DictItem],
                 text_col: str = "text") -> DataFrame:
    """Annotate + add `tok_re_mentions` (Catalyst path; tok ranges only —
    char ranges live in the full parser).

    PERF: free variables inside Spark higher-order-function lambdas are
    re-evaluated on every lambda invocation, so referencing the words/lemmas
    EXPRESSIONS inside per-position probes re-runs tokenization per token —
    O(n²) blowup (observed 280 s at sf0.1). The let-binding idiom below
    evaluates them ONCE per row: wrap both arrays in a single-element struct
    array and run the matcher inside that lambda scope, where z.ws / z.ls
    are bound variables (cheap reads)."""
    compiled = compile_items(items)
    ann = tx.annotate(df, text_col)
    # lemmas from words directly (NOT from toks): lets Catalyst prune the
    # heavy toks struct out of plans that only need mentions
    lemma_case = dialect.lemma_case_expr("t", "spark")
    ann = ann.withColumn(
        "lemmas", F.expr(f"transform(words, t -> ({lemma_case}))"))
    body = mentions_sql(compiled, "z.ws", "z.ls", "spark")
    let_expr = (f"try_element_at(transform("
                f"array(named_struct('ws', words, 'ls', lemmas)), "
                f"z -> {body}), 1)")
    return ann.withColumn("tok_re_mentions", F.expr(let_expr))


def mentions_feature_cols(mentions: str, toks: str,
                          entities: list[str]) -> list[Column]:
    """F5: zero-defaulted count + ratio per entity type."""
    cols: list[Column] = []
    tc = F.expr(f"size({toks})")
    for e in entities:
        cnt = F.expr(f"size(filter({mentions}, m -> m.label = {_q(e)}))")
        le = e.lower()
        cols.append(cnt.cast("long").alias(f"mentions_count_{le}"))
        cols.append(
            F.when(tc == 0, F.lit(0.0))
            .otherwise(cnt.cast("double") / tc.cast("double"))
            .alias(f"mentions_ratio_{le}"))
    return cols


def mention_token_join(df: DataFrame, items: list[DictItem],
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """O7/O10 at table granularity: containment range join token↔mention —
    every (doc, mention, token) pair with tok_beg <= pos < tok_end.

    Implemented WITHOUT a shuffle: both sides are arrays in the same row, so
    the 'join' is a nested transform+filter (the engine's containment join
    when granularity allows; the cross-table form would be an equi-join on
    doc_id + array filter — SURVEY.md §2.6)."""
    tagged = tag_mentions(df, items, text_col)
    pairs = tagged.select(
        F.col(id_col),
        F.explode(F.expr(
            "flatten(transform(tok_re_mentions, m -> "
            "transform(filter(transform(words, (w, i) -> named_struct("
            "'w', w, 'p', i)), t -> m.tok_beg <= t.p AND t.p < m.tok_end), "
            "t -> named_struct('label', m.label, 'item_id', m.item_id, "
            "'pos', t.p, 'word', t.w))))")).alias("x"))
    return pairs.select(
        id_col,
        F.col("x.label").alias("label"),
        F.col("x.item_id").alias("item_id"),
        F.col("x.pos").alias("pos"),
        F.col("x.word").alias("word"))
