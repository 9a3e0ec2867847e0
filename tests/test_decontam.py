"""Benchmark decontamination + PII scrub (round 6 LLM-pipeline operators).

Planted-fixture semantics plus plan-shape gates: the eval-gram probe must be
a broadcast join (the eval set is benchmark-sized by definition — a shuffle
of the 100 TB corpus against it would be the classic scale-killer), and both
PII passes must stay pure whole-stage codegen with zero exchanges.
"""

import pytest
from pyspark.sql import functions as F

from kgforge.operators import text
from kgforge.plans import physical_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- decontam


def test_decontaminate_flags_overlap(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        spark,
        [
            (1, "we saw a quick brown fox jumps over fences daily"),  # 4-gram hit
            (2, "completely unrelated words in this one here today"),
            (3, "too short"),  # fewer than n words -> no grams
            (4, None),  # null text -> no grams
        ],
    )
    out = {
        r["doc_id"]: (r["eval_gram_hits"], r["is_contaminated"])
        for r in text.decontaminate(train, ev, n=4).collect()
    }
    # "quick brown fox jumps" + "brown fox jumps over"
    assert out[1] == (2, True)
    assert out[2] == (0, False)
    assert out[3] == (0, False)
    assert out[4] == (0, False)
    assert len(out) == 4  # every input doc gets a verdict row


def test_decontaminate_normalizes_case_and_whitespace(spark):
    ev = _docs(spark, [(9, "Quick   Brown FOX jumps")])
    train = _docs(spark, [(1, "a quick brown fox jumps again")])
    (row,) = text.decontaminate(train, ev, n=4).collect()
    assert row["is_contaminated"] is True


def test_decontaminate_counts_repeat_occurrences(spark):
    ev = _docs(spark, [(9, "alpha beta gamma")])
    train = _docs(spark, [(1, "alpha beta gamma delta alpha beta gamma")])
    (row,) = text.decontaminate(train, ev, n=3).collect()
    # "alpha beta gamma" occurs twice in the training doc
    assert row["eval_gram_hits"] == 2


def test_decontaminate_probe_is_broadcast(spark):
    ev = _docs(spark, [(9, "alpha beta gamma")])
    train = _docs(spark, [(1, "alpha beta gamma delta")])
    import re

    plan = physical_plan(text.decontaminate(train, ev, n=3))
    # the gram probe against the eval set must be broadcast (keyed on the
    # 8-byte gram hash), never a shuffled join of the exploded corpus
    assert re.search(r"\) BroadcastHashJoin\nLeft keys \[1\]: \[gh#\d+", plan)


# ---------------------------------------------------------------- pii


def test_pii_signals_counts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail alice@example.com and bob.smith+x@sub.domain.org now"),
            (2, "server at 10.0.0.1 and backup 192.168.17.254 up"),
            (3, "call +33 123 4567 or +1 555 0100 today"),
            (4, "nothing sensitive here"),
            (5, None),
        ],
    )
    out = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["has_pii"])
        for r in text.pii_signals(docs).collect()
    }
    assert out[1] == (2, 0, 0, True)
    assert out[2] == (0, 2, 0, True)
    assert out[3] == (0, 0, 2, True)
    assert out[4] == (0, 0, 0, False)
    assert out[5] == (0, 0, 0, False)


def test_pii_redact_replaces_in_order(spark):
    docs = _docs(
        spark,
        [(1, "alice@example.com then 10.0.0.1 then +1 555 0100 end")],
    )
    (row,) = text.pii_redact(docs).collect()
    assert row["text"] == "<EMAIL> then <IP> then <PHONE> end"
    assert row["n_pii"] == 3


def test_pii_redact_keeps_other_columns_and_clean_text(spark):
    docs = spark.createDataFrame(
        [(1, "plain text", "en")], "doc_id long, text string, lang string"
    )
    (row,) = text.pii_redact(docs).collect()
    assert row["text"] == "plain text"
    assert row["lang"] == "en"
    assert row["n_pii"] == 0


def test_pii_paths_have_no_exchange(spark):
    docs = _docs(spark, [(1, "x"), (2, "y")])
    for df in (text.pii_signals(docs), text.pii_redact(docs)):
        assert "Exchange" not in physical_plan(df)


# ------------------------------------------------------- decontaminate_strip


def test_strip_merges_overlapping_spans(spark):
    ev = _docs(spark, [(100, "c d e"), (101, "d e f")])
    train = _docs(
        spark,
        [
            (1, "a b c d e f g h"),  # [3,5] + [4,6] merge -> strip [3,6]
            (2, "clean text with no overlap here"),
            (3, "x c d e y z c d e q"),  # two separate islands
            (4, "short"),  # fewer than n words
            (5, None),
            (6, "  C   D  e   tail   "),  # normalization still matches
        ],
    )
    out = {
        r["doc_id"]: (r["text"], r["n_stripped"])
        for r in text.decontaminate_strip(train, ev, n=3).collect()
    }
    assert out[1] == ("a b g h", 4)
    assert out[2] == ("clean text with no overlap here", 0)
    assert out[3] == ("x y z q", 6)
    assert out[4] == ("short", 0)
    assert out[5] == ("", 0)
    assert out[6] == ("tail", 3)
    assert len(out) == 6


def test_strip_whole_doc_contaminated(spark):
    ev = _docs(spark, [(100, "p q r s")])
    train = _docs(spark, [(1, "p q r s"), (2, "p q r s p q r s")])
    out = {
        r["doc_id"]: (r["text"], r["n_stripped"])
        for r in text.decontaminate_strip(train, ev, n=4).collect()
    }
    # doc 2: matches at 1 and 5 overlap via the interior grams? no —
    # only the exact eval 4-gram matches, at starts 1 and 5: spans
    # [1,4] and [5,8] are adjacent-but-disjoint, both stripped
    assert out[1] == ("", 4)
    assert out[2] == ("", 8)


def test_strip_probe_is_broadcast_and_corpus_never_shuffles_text(spark):
    import re

    ev = _docs(spark, [(9, "alpha beta gamma")])
    train = _docs(spark, [(1, "alpha beta gamma delta")])
    plan = physical_plan(text.decontaminate_strip(train, ev, n=3))
    # gram probe keyed on the 8-byte hash must broadcast the eval side
    assert re.search(r"\) BroadcastHashJoin\nLeft keys \[1\]: \[gh#\d+", plan)
    # the only shuffles allowed are over MATCHED spans (doc_id, s, e) —
    # benchmark-sized; no Exchange may carry the corpus word array
    for m in re.finditer(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan):
        assert "w#" not in m.group(1), f"corpus words shuffled: {m.group(1)}"
