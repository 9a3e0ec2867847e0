"""Exact substring dedup (Lee et al. 2022 semantics over word windows):
every duplicated k-word window keeps only its globally first occurrence.
Planted-fixture semantics, span-merge behavior, determinism under
partitioning, clique linearity, and the no-text-in-shuffle scale gate."""

import pytest
from pyspark.sql import functions as F

from kgforge.operators import dedup
from kgforge.plans import physical_plan


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def sub_docs(spark):
    return _docs(
        spark,
        [
            (1, "the quick brown fox jumps over"),
            (2, "intro words here the quick brown fox jumps tail end"),
            (3, "completely unrelated content in this document body"),
            (4, "tiny doc"),  # fewer than k words -> no windows
            (5, None),
        ],
    )


def test_first_occurrence_kept_rest_stripped(sub_docs):
    out = {
        r.doc_id: (r.text, r.n_stripped)
        for r in dedup.substring_dedup(sub_docs, k=4).collect()
    }
    # doc 1 holds the global first occurrence of both duplicated windows
    assert out[1] == ("the quick brown fox jumps over", 0)
    # doc 2 loses the merged span "the quick brown fox jumps" (5 words)
    assert out[2] == ("intro words here tail end", 5)
    assert out[3] == ("completely unrelated content in this document body", 0)
    assert out[4] == ("tiny doc", 0)
    assert out[5] == ("", 0)


def test_within_doc_repeat_keeps_first(spark):
    docs = _docs(spark, [(7, "alpha beta gamma delta X alpha beta gamma delta")])
    (row,) = dedup.substring_dedup(docs, k=4).collect()
    # second occurrence of the repeated 4-window is stripped, first kept
    assert row.text == "alpha beta gamma delta x"  # normalized (lowercased)
    assert row.n_stripped == 4


def test_overlapping_windows_merge_into_one_span(spark):
    # an 8-word sentence duplicated verbatim: 5 overlapping 4-windows in
    # doc 2 must merge to ONE 8-word span, not 5 * 4 stripped words
    s = "one two three four five six seven eight"
    docs = _docs(spark, [(1, s + " unique1"), (2, "prefix " + s + " suffix")])
    out = {r.doc_id: r for r in dedup.substring_dedup(docs, k=4).collect()}
    assert out[2].text == "prefix suffix"
    assert out[2].n_stripped == 8
    assert out[1].n_stripped == 0


def test_keeper_is_min_doc_then_position(spark):
    # same window appears at position 3 of doc 1 and position 1 of doc 2:
    # doc ordering dominates, so doc 1 keeps it even though doc 2's copy
    # starts earlier in its text
    docs = _docs(
        spark,
        [
            (2, "alpha beta gamma end"),
            (1, "pre pad alpha beta gamma"),
        ],
    )
    out = {r.doc_id: r.text for r in dedup.substring_dedup(docs, k=3).collect()}
    assert out[1] == "pre pad alpha beta gamma"
    assert out[2] == "end"


def test_partitioning_invariant(sub_docs):
    a = {r.doc_id: r.text for r in dedup.substring_dedup(sub_docs.repartition(7), k=4).collect()}
    b = {r.doc_id: r.text for r in dedup.substring_dedup(sub_docs.coalesce(1), k=4).collect()}
    assert a == b


def test_normalization_folds_case_and_whitespace(spark):
    docs = _docs(
        spark,
        [
            (1, "Shared   License  Header Text body one"),
            (2, "shared license header text body two"),
        ],
    )
    out = {r.doc_id: r.text for r in dedup.substring_dedup(docs, k=5).collect()}
    assert out[1] == "shared license header text body one"
    assert out[2] == "two"


def test_copy_family_linearity(spark):
    """200 exact copies: keeper survives intact, 199 strip to empty —
    window-row volume is O(m * windows_per_doc), never O(m^2) pairs."""
    rows = [(i, "aaa bbb ccc ddd eee") for i in range(200)]
    out = dedup.substring_dedup(_docs(spark, rows), k=4).collect()
    by_id = {r.doc_id: (r.text, r.n_stripped) for r in out}
    assert by_id[0] == ("aaa bbb ccc ddd eee", 0)
    assert all(by_id[i] == ("", 5) for i in range(1, 200))


def test_shuffle_carries_hashes_not_text(sub_docs):
    """Scale gate: every Exchange keys on the 8-byte gram hash or doc_id —
    neither the gram strings nor the word arrays enter a shuffle key."""
    plan = physical_plan(dedup.substring_dedup(sub_docs, k=4))
    seen = 0
    for line in plan.splitlines():
        if "hashpartitioning(" in line:
            seen += 1
            assert ("gh#" in line) or ("doc_id#" in line), line
            assert "w#" not in line and "text#" not in line, line
    assert seen >= 1


def test_random_corpus_invariants(spark):
    """Seeded random corpus: for every doc, (1) kept text is a subsequence
    of the normalized words, (2) n_stripped accounts exactly for the words
    removed, (3) total kept+stripped equals total input words."""
    import random

    rng = random.Random(6)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(120)
    ]
    out = dedup.substring_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"), k=3
    ).collect()
    norm = {i: t.lower().split() for i, t in rows}
    for r in out:
        kept = r.text.split() if r.text else []
        orig = norm[r.doc_id]
        assert len(kept) + r.n_stripped == len(orig), r.doc_id
        it = iter(orig)  # subsequence check
        assert all(any(w == o for o in it) for w in kept), r.doc_id


# -------------------------------------------------------------- incremental


def test_incremental_matches_one_shot(spark, tmpdir_path):
    import os

    state = os.path.join(tmpdir_path, "sub_state")
    b1 = _docs(spark, [
        (1, "the quick brown fox jumps over"),
        (2, "totally fresh words in here now"),
    ])
    b2 = _docs(spark, [
        (10, "prefix the quick brown fox jumps suffix"),
        (11, "totally fresh words in here now again"),
    ])
    inc1 = dedup.incremental_substring_dedup(spark, b1, state, k=4).collect()
    inc2 = dedup.incremental_substring_dedup(spark, b2, state, k=4).collect()
    inc = {r.doc_id: (r.text, r.n_stripped) for r in [*inc1, *inc2]}
    union = b1.unionByName(b2)
    one = {r.doc_id: (r.text, r.n_stripped)
           for r in dedup.substring_dedup(union, k=4).collect()}
    assert inc == one
    # and the cross-batch strip actually happened
    assert inc[10] == ("prefix suffix", 5)
    assert inc[11] == ("again", 6)


def test_incremental_guards(spark, tmpdir_path):
    import os

    import pytest as _pt

    state = os.path.join(tmpdir_path, "sub_state_g")
    dedup.incremental_substring_dedup(
        spark, _docs(spark, [(5, "a b c d e")]), state, k=4
    ).collect()
    with _pt.raises(ValueError, match="MONOTONE"):
        dedup.incremental_substring_dedup(
            spark, _docs(spark, [(5, "x y z w v")]), state, k=4
        )
    with _pt.raises(ValueError, match="k="):
        dedup.incremental_substring_dedup(
            spark, _docs(spark, [(9, "x y z w v")]), state, k=3
        )
    # empty batch is a no-op
    out = dedup.incremental_substring_dedup(
        spark, _docs(spark, []), state, k=4
    )
    assert out.count() == 0


def test_incremental_within_batch_dedup_still_applies(spark, tmpdir_path):
    import os

    state = os.path.join(tmpdir_path, "sub_state_w")
    out = {
        r.doc_id: (r.text, r.n_stripped)
        for r in dedup.incremental_substring_dedup(
            spark,
            _docs(spark, [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")]),
            state,
            k=4,
        ).collect()
    }
    assert out[1] == ("alpha beta gamma delta", 0)
    assert out[2] == ("", 4)


def test_streaming_substring_matches_one_shot(spark, tmpdir_path):
    """run_incremental_substring over file-arriving batches: the union of
    scrubbed outputs equals one-shot substring_dedup over all files, and a
    restart on the same checkpoint re-emits nothing."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgforge.streaming.incremental import run_incremental_substring

    def write_chunk(dirpath, name, rows):
        os.makedirs(dirpath, exist_ok=True)
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": i, "text": t} for i, t in rows]
            ),
            os.path.join(dirpath, name),
        )

    src = os.path.join(tmpdir_path, "ss_src")
    state = os.path.join(tmpdir_path, "ss_state")
    ckpt = os.path.join(tmpdir_path, "ss_ckpt")
    out = os.path.join(tmpdir_path, "ss_out")
    rows1 = [(1, "the quick brown fox jumps over"), (2, "other fresh words here today")]
    rows2 = [(10, "pre the quick brown fox jumps post")]
    write_chunk(src, "a.parquet", rows1)
    run_incremental_substring(spark, src, state, ckpt, out, k=4)
    assert spark.read.parquet(out).count() == 2

    write_chunk(src, "b.parquet", rows2)
    run_incremental_substring(spark, src, state, ckpt, out, k=4)
    got = {r.doc_id: (r.text, r.n_stripped) for r in spark.read.parquet(out).collect()}
    want = {
        r.doc_id: (r.text, r.n_stripped)
        for r in dedup.substring_dedup(_docs(spark, rows1 + rows2), k=4).collect()
    }
    assert got == want
    assert got[10] == ("pre post", 5)

    # restart with no new files: nothing re-emits
    run_incremental_substring(spark, src, state, ckpt, out, k=4)
    assert spark.read.parquet(out).count() == 3


def test_compact_substring_state(spark, tmpdir_path):
    import os

    state = os.path.join(tmpdir_path, "sub_state_c")
    dedup.incremental_substring_dedup(
        spark, _docs(spark, [(1, "a b c d e"), (2, "f g h i j")]), state, k=4
    ).collect()
    dedup.incremental_substring_dedup(
        spark, _docs(spark, [(10, "k l m n o")]), state, k=4
    ).collect()
    m = dedup.compact_substring_state(spark, state)
    assert m["keeper_rows_after"] == m["keeper_rows_before"] > 0
    # behavior is unchanged after compaction: old grams still strip
    out = {
        r.doc_id: (r.text, r.n_stripped)
        for r in dedup.incremental_substring_dedup(
            spark, _docs(spark, [(20, "x a b c d e y")]), state, k=4
        ).collect()
    }
    assert out[20] == ("x y", 5)
    # wrong-method guard
    import pytest as _pt

    other = os.path.join(tmpdir_path, "not_sub")
    os.makedirs(other)
    with _pt.raises(ValueError, match="not a substring state"):
        dedup.compact_substring_state(spark, other)
