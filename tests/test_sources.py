"""Sources/sinks (S1-S5): corpus read, rule-file compile round-trip —
mirrors ner_test.clj:51-86 (rule-file round-trip)."""

from __future__ import annotations

from clj_nlp_parse_spark import sources
from clj_nlp_parse_spark.operators.dictionary import DictItem


def test_ingest_utterances(spark):
    df = sources.ingest_utterances(spark, ["hello world", "bye"])
    rows = df.collect()
    assert [r.doc_id for r in rows] == ["utt-000000", "utt-000001"]


def test_read_corpus_single_utterance(spark, tmp_path):
    p = tmp_path / "moby.txt"
    p.write_text("Call me Ishmael.\nSome years ago - never mind how long.\n")
    df = sources.read_corpus_file(spark, str(p))
    row = df.collect()[0]
    assert "Call me Ishmael." in row.text and "never mind" in row.text
    assert df.count() == 1
    per_line = sources.read_corpus_file(spark, str(p), join_lines=False)
    assert per_line.count() == 2


def test_rule_file_roundtrip(tmp_path):
    items = [
        DictItem(123, "Teddy Grams", "PRODUCT",
                 features={"food-type": "snack"}),
        DictItem(7, "dups", "RARE", lem_min_len=0),
    ]
    rp, fp = str(tmp_path / "x.rules"), str(tmp_path / "x.json")
    sources.write_regex_files(rp, fp, items)
    rules = open(rp).read()
    assert 'Annotate($0, ner, "PRODUCT")' in rules
    assert '[{word:"teddy"}] [{word:"grams"}]' in rules
    assert '[{lemma:"dup"}]' in rules
    back = sources.read_regex_features(fp)
    assert back[0]["item_id"] == 123
    assert back[0]["features"] == {"food-type": "snack"}
    assert back[1]["pattern"] == [{"field": "lemma", "word": "dup"}]
