"""Incremental corpus dedup (dedup.incremental_minhash_pairs +
dedup.dedup_clusters_incremental): batch-wise pair generation against the
persisted band state, and cluster maintenance from compressed star edges —
the per-batch path of a growing corpus.  The gate: the union of per-batch
results must equal the one-shot run over the full corpus."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

from kgforge.operators import dedup

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
)

# batch 1: two near-dup families + singletons; batch 2: new docs joining
# existing families, a new family, and a bridge between old families
BATCH1 = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "the quick brown fox jumps over the lazy dog again and again tonight"),
    (2, "completely different content about spark shuffles and parquet files"),
    (3, "numerical linear algebra kernels on tensor cores with mixed precision"),
    (4, "spark structured streaming with watermarks and stateful operators"),
]
BATCH2 = [
    (10, "the quick brown fox jumps over the lazy dog again and again today"),  # joins {0,1}
    (11, "completely different content about spark shuffles and parquet files"),  # joins {2}
    (12, "a brand new topic about knowledge graphs and entity linking"),
    (13, "a brand new topic about knowledge graphs and entity linking today"),  # pairs with 12
]


@pytest.fixture(scope="module")
def frames(spark):
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    return b1, b2, b1.unionByName(b2)


KW = dict(threshold=0.5, max_df=None)  # max_df=None: exact batch-union equivalence


def test_incremental_pairs_union_equals_oneshot(spark, frames):
    b1, b2, full = frames
    empty_bands = spark.createDataFrame([], "doc_id long, band int, band_sig long")
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    p1, bands1 = dedup.incremental_minhash_pairs(b1, empty_bands, empty_docs, **KW)
    p2, bands2 = dedup.incremental_minhash_pairs(b2, bands1, b1, **KW)
    got = {(r.a, r.b, r.jaccard) for r in p1.collect()} | {
        (r.a, r.b, r.jaccard) for r in p2.collect()
    }
    want = {(r.a, r.b, r.jaccard) for r in dedup.minhash_lsh_pairs(full, **KW).collect()}
    assert got == want
    assert want  # discriminating: the corpus actually has near-dups
    # batch-2 output involves at least one new doc per pair
    assert all(r.a >= 10 or r.b >= 10 for r in p2.collect())
    # the state delta is exactly the batch's band rows
    assert bands2.count() == 4 * len(BATCH2)


def test_incremental_clusters_equal_oneshot(spark, frames):
    b1, b2, full = frames
    empty_bands = spark.createDataFrame([], "doc_id long, band int, band_sig long")
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    p1, bands1 = dedup.incremental_minhash_pairs(b1, empty_bands, empty_docs, **KW)
    assign1 = dedup.dedup_clusters_incremental(b1, None, p1)
    p2, _ = dedup.incremental_minhash_pairs(b2, bands1, b1, **KW)
    assign2 = dedup.dedup_clusters_incremental(full, assign1, p2)
    got = {(r.doc_id, r.cluster_id, r.is_canonical) for r in assign2.collect()}
    want = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in dedup.dedup_clusters(full, pairs=dedup.minhash_lsh_pairs(full, **KW)).collect()
    }
    assert got == want
    by_doc = dict((d, c) for d, c, _ in got)
    assert by_doc[10] == 0 and by_doc[11] == 2  # new docs joined old clusters
    assert by_doc[13] == 12  # new family rooted at its own min


def test_incremental_bridge_merges_old_components(spark):
    """A new doc similar to members of TWO distinct old clusters must merge
    them: the star edges of both old components meet through the new pair
    set."""
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (5, "y"), (6, "y"), (9, "z")], "doc_id long, text string"
    )
    prev = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (5, 5, True), (6, 5, False), (9, 9, True)],
        "doc_id long, cluster_id long, is_canonical boolean",
    )
    new_pairs = spark.createDataFrame([(2, 20), (6, 20)], "a long, b long")
    all_docs = docs.unionByName(
        spark.createDataFrame([(20, "xy")], "doc_id long, text string")
    )
    out = {r.doc_id: r.cluster_id for r in
           dedup.dedup_clusters_incremental(all_docs, prev, new_pairs).collect()}
    assert out[1] == out[2] == out[5] == out[6] == out[20] == 1
    assert out[9] == 9  # untouched singleton survives


def test_streaming_dedup_equals_oneshot(spark, tmpdir_path):
    """run_incremental_dedup over file-arriving batches must end with the
    same cluster assignment as a one-shot dedup over the full corpus, and a
    re-run with no new files must change nothing (epoch ledger + stream
    checkpoint)."""
    import os

    from kgforge.streaming.incremental import run_incremental_dedup

    src_dir = os.path.join(tmpdir_path, "sdedup_src")
    state = os.path.join(tmpdir_path, "sdedup_state")
    ckpt = os.path.join(tmpdir_path, "sdedup_ckpt")
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    b1.coalesce(1).write.mode("append").parquet(src_dir)
    run_incremental_dedup(spark, src_dir, state, ckpt, threshold=0.5)
    b2.coalesce(1).write.mode("append").parquet(src_dir)
    run_incremental_dedup(spark, src_dir, state, ckpt, threshold=0.5)

    got = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in spark.read.parquet(os.path.join(state, "assign")).collect()
    }
    full = b1.unionByName(b2)
    want = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in dedup.dedup_clusters(
            full, pairs=dedup.minhash_lsh_pairs(full, threshold=0.5)
        ).collect()
    }
    assert got == want
    # idle re-run: no new files -> state unchanged
    run_incremental_dedup(spark, src_dir, state, ckpt, threshold=0.5)
    again = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in spark.read.parquet(os.path.join(state, "assign")).collect()
    }
    assert again == got


def test_incremental_simhash_pairs_union_matches_oneshot_clusters(spark, frames):
    """The simhash analogue of the minhash batch-union gate, at the
    CONNECTIVITY level (round 5: same-signature groups star-compress, so
    the literal pair lists differ between batch-union and one-shot while
    their connected components must be identical) — and verification never
    touches old text (the band rows carry the signatures)."""
    b1, b2, full = frames
    empty = spark.createDataFrame([], "doc_id long, simhash long")
    p1, sigs1 = dedup.incremental_simhash_pairs(b1, empty, max_hamming=10)
    p2, sigs2 = dedup.incremental_simhash_pairs(b2, sigs1, max_hamming=10)
    union_pairs = p1.select("a", "b").unionByName(p2.select("a", "b"))
    got = {(r.doc_id, r.cluster_id, r.is_canonical)
           for r in dedup.dedup_clusters(full, pairs=union_pairs).collect()}
    want = {(r.doc_id, r.cluster_id, r.is_canonical)
            for r in dedup.dedup_clusters(
                full, pairs=dedup.simhash_near_pairs(full, max_hamming=10)).collect()}
    assert got == want
    assert {r.a for r in p1.collect()} | {r.b for r in p1.collect()}  # discriminating
    assert all(r.a >= 10 or r.b >= 10 for r in p2.collect())
    # exact cross-batch copy pairs at hamming 0 through the signature state
    assert (0, 10, 0) in {(r.a, r.b, r.hamming) for r in p2.collect()}
    assert sigs2.count() == len(BATCH2)  # one signature row per batch doc


def test_simhash_tombstoned_rep_reelects_in_state(spark, tmpdir_path):
    """Removing a signature group's representative must NOT orphan the
    group in the simhash state: rep band rows derive from SURVIVING
    signatures each batch, so a later same-signature doc still links to
    the min surviving member (the round-5 conservative miss, closed)."""
    state = os.path.join(tmpdir_path, "shrm_state")
    text_a = "identical body shared by the whole signature group"
    b1 = spark.createDataFrame(
        [(0, text_a), (1, text_a), (4, "an unrelated document lives here")],
        "doc_id long, text string",
    )
    dedup.incremental_dedup_update(spark, b1, state, method="simhash")
    removed = spark.createDataFrame([(0,)], "doc_id long")  # the sig rep
    dedup.incremental_dedup_remove(spark, removed, state)
    b2 = spark.createDataFrame([(10, text_a)], "doc_id long, text string")
    assign = {r.doc_id: r.cluster_id
              for r in dedup.incremental_dedup_update(
                  spark, b2, state, method="simhash").collect()}
    assert 0 not in assign
    assert assign[10] == assign[1] == 1  # re-elected survivor anchors the group
    assert assign[4] == 4
    # operator-level isolation (identical content also links via hashes/,
    # so pin the SIGNATURE path alone): deriving reps from the surviving
    # sig rows must pair the new doc with doc 1 directly
    surv = spark.read.parquet(os.path.join(state, "sigs")).filter("doc_id != 0")
    p, _ = dedup.incremental_simhash_pairs(b2, surv, max_hamming=3)
    assert (1, 10) in {(r.a, r.b) for r in p.collect()}


def test_simhash_pairs_linear_in_identical_clique(spark):
    """A 1,000-copy identical-content group must emit 999 star edges, not
    ~500k hamming-0 pairs (the exact_pairs round-5 argument applied to the
    simhash band join — every member shares every band key)."""
    rows = [(i, "identical document body for the simhash clique test") for i in range(1000)]
    rows += [(2000, "some completely different other text")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3)
    assert pairs.count() == 999
    assert pairs.filter("hamming = 0").count() == 999
    assign = {r.doc_id: r.cluster_id
              for r in dedup.dedup_clusters(docs, pairs=pairs).collect()}
    assert all(assign[i] == 0 for i in range(1000)) and assign[2000] == 2000


def test_incremental_state_simhash_cli_matches_oneshot(spark, tmpdir_path, capsys):
    """--state with --method simhash: two batches must end with the same
    clusters as a one-shot simhash run over the full corpus (VERDICT r4
    item 7 — the CLI error for simhash state mode is gone)."""
    import dedup_corpus

    b1 = BATCH1
    b2 = [(10, BATCH1[0][1]), (12, "a brand new topic about knowledge graphs")]
    full = b1 + b2
    paths = {}
    for name, rows in (("b1", b1), ("b2", b2), ("full", full)):
        p = os.path.join(tmpdir_path, f"sh_{name}.parquet")
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
        paths[name] = p
    state = os.path.join(tmpdir_path, "sh_state")
    out1, out2, out_full = (os.path.join(tmpdir_path, f"sh_out{i}") for i in range(3))
    common = ["--method", "simhash", "--max-hamming", "10"]
    assert dedup_corpus.main(["--docs", paths["b1"], "--out", out1, "--state", state, *common]) == 0
    assert dedup_corpus.main(["--docs", paths["b2"], "--out", out2, "--state", state, *common]) == 0
    assert dedup_corpus.main(["--docs", paths["full"], "--out", out_full, *common]) == 0
    capsys.readouterr()
    got = {(r.doc_id, r.cluster_id, r.is_canonical)
           for r in spark.read.parquet(os.path.join(out2, "clusters")).collect()}
    want = {(r.doc_id, r.cluster_id, r.is_canonical)
            for r in spark.read.parquet(os.path.join(out_full, "clusters")).collect()}
    assert got == want
    by_doc = {d: c for d, c, _ in got}
    assert by_doc[10] == 0  # exact copy of doc 0 joined its cluster via state


def test_state_method_mismatch_raises(spark, tmpdir_path):
    """A state dir pinned to one sketch method must refuse a batch with the
    other — a silent schema mix would just find zero candidates."""
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    state = os.path.join(tmpdir_path, "mm_state")
    dedup.incremental_dedup_update(spark, b1, state, method="minhash")
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    with pytest.raises(ValueError, match="minhash"):
        dedup.incremental_dedup_update(spark, b2, state, method="simhash")


def test_hot_batch_still_links_to_old_exact_copies(spark, tmpdir_path):
    """Cross-batch guard-escape closure (round 5): a batch holding MORE
    than max_df copies of one content emits no band rows for them, yet the
    hashes/ state must still link every copy to the OLD copy of the same
    content — one hub edge per new doc, no text reads."""
    state = os.path.join(tmpdir_path, "hot_state")
    b1 = spark.createDataFrame(
        [(0, "identical boilerplate body repeated across every batch"),
         (1, "some unrelated first-batch document text")],
        "doc_id long, text string",
    )
    dedup.incremental_dedup_update(spark, b1, state, max_df=3)
    # batch 2: 10 copies of doc 0's content -> every shingle exceeds
    # max_df=3 WITHIN the batch, so the family has zero band rows
    b2 = spark.createDataFrame(
        [(100 + i, "identical boilerplate body repeated across every batch")
         for i in range(10)],
        "doc_id long, text string",
    )
    assign = {r.doc_id: r.cluster_id
              for r in dedup.incremental_dedup_update(spark, b2, state, max_df=3).collect()}
    assert all(assign[100 + i] == 0 for i in range(10))  # linked via hashes/
    assert assign[1] == 1


def test_compact_dedup_state_drops_tombstoned_rows(spark, tmpdir_path):
    """Compaction physically removes tombstoned rows from every state table,
    clears the tombstone set, and later batches still behave identically
    (the removed content's hub disappears with it)."""
    state = os.path.join(tmpdir_path, "cmp_state")
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    dedup.incremental_dedup_update(spark, b1, state, threshold=0.5)
    removed = spark.createDataFrame([(0,)], "doc_id long")
    dedup.incremental_dedup_remove(spark, removed, state)
    m = dedup.compact_dedup_state(spark, state)
    assert m["compacted"]
    assert m["rows_dropped"]["corpus"] == 1 and m["rows_dropped"]["bands"] == 4
    assert not os.path.exists(os.path.join(state, "tombstones"))
    corpus_ids = {r.doc_id for r in spark.read.parquet(os.path.join(state, "corpus")).collect()}
    assert 0 not in corpus_ids and corpus_ids == {1, 2, 3, 4}
    # idempotent: nothing left to compact
    assert dedup.compact_dedup_state(spark, state) == {
        "compacted": False, "reason": "no tombstones"
    }
    # a post-compaction batch matching the REMOVED doc's text becomes its
    # own new cluster root (never resurrects id 0); near-dup doc 1 links
    b2 = spark.createDataFrame([(50, BATCH1[0][1])], "doc_id long, text string")
    assign = {r.doc_id: r.cluster_id
              for r in dedup.incremental_dedup_update(spark, b2, state, threshold=0.5).collect()}
    assert 0 not in assign
    assert assign[50] == assign[1]  # near-dup family reforms around survivors


def test_corrupt_state_raises_instead_of_resetting(spark, tmpdir_path):
    """A corrupt bands/ dir (present but unreadable) must RAISE — the
    pre-round-5 bare `except Exception` treated it as 'first batch' and the
    assign/ swap then overwrote the good state with a from-scratch
    re-cluster of the new batch alone (VERDICT r4 item 2)."""
    import os

    state = os.path.join(tmpdir_path, "corrupt_state")
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    dedup.incremental_dedup_update(spark, b1, state, threshold=0.5)
    # corrupt the band state: truncate every parquet footer
    bands = os.path.join(state, "bands")
    for f in os.listdir(bands):
        if f.endswith(".parquet"):
            with open(os.path.join(bands, f), "r+b") as fh:
                fh.truncate(4)
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    before = {
        (r.doc_id, r.cluster_id)
        for r in spark.read.parquet(os.path.join(state, "assign")).collect()
    }
    with pytest.raises(Exception):
        dedup.incremental_dedup_update(spark, b2, state, threshold=0.5)
    # the failure happened BEFORE any state mutation: assign/ is untouched
    after = {
        (r.doc_id, r.cluster_id)
        for r in spark.read.parquet(os.path.join(state, "assign")).collect()
    }
    assert after == before


def test_assign_swap_crash_recovery(spark, tmpdir_path):
    """Every crash point inside the assign swap must be recoverable: a
    complete staged dir is promoted (it is the newer result); a renamed-away
    old dir is restored when no staged result completed."""
    import os

    from kgforge import fsio
    from kgforge.operators.dedup import _recover_assign_swap

    fs = fsio.get_fs(tmpdir_path)
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")

    # crash between rename-old and rename-new, staged write complete: the
    # staged (newer) assignment must win over the renamed-away old one
    state = os.path.join(tmpdir_path, "swap_a")
    dedup.incremental_dedup_update(spark, b1, state, threshold=0.5)
    assign_p = os.path.join(state, "assign")
    os.replace(assign_p, assign_p + "__old")
    staged = spark.read.parquet(assign_p + "__old").filter("doc_id != 0")
    staged.write.parquet(assign_p + "__staged")
    want = {(r.doc_id, r.cluster_id) for r in staged.collect()}
    _recover_assign_swap(fs, assign_p)
    assert os.path.exists(assign_p)
    assert not os.path.exists(assign_p + "__old") and not os.path.exists(assign_p + "__staged")
    got = {(r.doc_id, r.cluster_id) for r in spark.read.parquet(assign_p).collect()}
    assert got == want

    # crash mid-staged-write (no _SUCCESS), assign renamed away: restore old
    state2 = os.path.join(tmpdir_path, "swap_b")
    dedup.incremental_dedup_update(spark, b1, state2, threshold=0.5)
    assign_p2 = os.path.join(state2, "assign")
    want2 = {(r.doc_id, r.cluster_id) for r in spark.read.parquet(assign_p2).collect()}
    os.replace(assign_p2, assign_p2 + "__old")
    os.makedirs(assign_p2 + "__staged")  # incomplete: no _SUCCESS marker
    _recover_assign_swap(fs, assign_p2)
    got2 = {(r.doc_id, r.cluster_id) for r in spark.read.parquet(assign_p2).collect()}
    assert got2 == want2
    assert not os.path.exists(assign_p2 + "__staged")


def test_streaming_dedup_simhash_equals_oneshot(spark, tmpdir_path):
    """run_incremental_dedup with method='simhash' must match a one-shot
    simhash dedup over the full corpus (round-5 method threading)."""
    import os

    from kgforge.streaming.incremental import run_incremental_dedup

    src_dir = os.path.join(tmpdir_path, "ssh_src")
    state = os.path.join(tmpdir_path, "ssh_state")
    ckpt = os.path.join(tmpdir_path, "ssh_ckpt")
    b1 = spark.createDataFrame(BATCH1, "doc_id long, text string")
    b2 = spark.createDataFrame(BATCH2, "doc_id long, text string")
    b1.coalesce(1).write.mode("append").parquet(src_dir)
    run_incremental_dedup(spark, src_dir, state, ckpt, method="simhash", max_hamming=10)
    b2.coalesce(1).write.mode("append").parquet(src_dir)
    run_incremental_dedup(spark, src_dir, state, ckpt, method="simhash", max_hamming=10)
    got = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in spark.read.parquet(os.path.join(state, "assign")).collect()
    }
    full = b1.unionByName(b2)
    want = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in dedup.dedup_clusters(
            full, pairs=dedup.simhash_near_pairs(full, max_hamming=10)
        ).collect()
    }
    assert got == want


def test_tombstones_reelect_canonical(spark):
    """Removing a canonical re-elects the min surviving member AND relabels
    the cluster to it (round 5, ADVICE r4: a label naming a removed doc
    breaks is_canonical = label-equality downstream); removed docs leave
    the assignment; untouched clusters keep their flags; exactly one
    canonical per surviving cluster."""
    assign = spark.createDataFrame(
        [(0, 0, True), (1, 0, False), (2, 0, False),
         (5, 5, True), (6, 5, False), (9, 9, True)],
        "doc_id long, cluster_id long, is_canonical boolean",
    )
    removed = spark.createDataFrame([(0,), (9,)], "doc_id long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.apply_tombstones(assign, removed).collect()}
    assert 0 not in out and 9 not in out
    assert out[1] == (1, True)  # re-elected keeper IS the new label
    assert out[2] == (1, False)
    assert out[5] == (5, True) and out[6] == (5, False)
    per_cluster = {}
    for _, (cid, canon) in out.items():
        per_cluster[cid] = per_cluster.get(cid, 0) + int(canon)
    assert all(n == 1 for n in per_cluster.values())


def test_tombstoned_assignment_safe_as_incremental_state(spark):
    """The ADVICE r4 regression: feeding a post-tombstone assignment as
    prev_assign into dedup_clusters_incremental must NOT drop surviving
    clusters from the keep set (the old opaque label named a removed doc,
    so no member satisfied doc_id == cluster_id)."""
    assign = spark.createDataFrame(
        [(0, 0, True), (1, 0, False), (2, 0, False)],
        "doc_id long, cluster_id long, is_canonical boolean",
    )
    removed = spark.createDataFrame([(0,)], "doc_id long")
    after = dedup.apply_tombstones(assign, removed)
    docs = spark.createDataFrame([(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string")
    no_pairs = spark.createDataFrame([], "a long, b long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.dedup_clusters_incremental(docs, after, no_pairs).collect()}
    assert out[1] == (1, True)  # the re-elected canonical SURVIVES the round-trip
    assert out[2] == (1, False)
    assert out[3] == (3, True)


def test_tombstone_split_breaks_bridged_cluster(spark, tmpdir_path):
    """Removing a BRIDGE document must split its cluster into the true
    remaining components when the pair history is retained (VERDICT r4
    item 5): chain a-b-c with b removed yields {a}, {c}."""
    assign = spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 1, False), (7, 7, True)],
        "doc_id long, cluster_id long, is_canonical boolean",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")  # chain 1-2-3
    removed = spark.createDataFrame([(2,)], "doc_id long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.apply_tombstones_split(assign, removed, pairs).collect()}
    assert out[1] == (1, True) and out[3] == (3, True)  # split into two keepers
    assert out[7] == (7, True)  # untouched cluster passes through
    assert 2 not in out


def test_remove_cli_reelects_and_next_batch_excludes(spark, tmpdir_path, capsys):
    """CLI --remove: removing a canonical re-elects inside the state, keep/
    never contains a removed id, and the NEXT batch cannot pair with (or
    chain through) the removed doc."""
    import dedup_corpus

    state = os.path.join(tmpdir_path, "rm_state")
    out1 = os.path.join(tmpdir_path, "rm_out1")
    b1 = [(0, "the quick brown fox jumps over the lazy dog again and again today"),
          (1, "the quick brown fox jumps over the lazy dog again and again today"),
          (4, "numerical linear algebra kernels on tensor cores with mixed precision")]
    p_b1 = os.path.join(tmpdir_path, "rm_b1.parquet")
    spark.createDataFrame(b1, "doc_id long, text string").write.parquet(p_b1)
    assert dedup_corpus.main(["--docs", p_b1, "--out", out1, "--state", state]) == 0
    capsys.readouterr()

    # remove the canonical doc 0 via a text id file
    ids_f = os.path.join(tmpdir_path, "rm_ids.txt")
    with open(ids_f, "w") as fh:
        fh.write("0\n")
    out2 = os.path.join(tmpdir_path, "rm_out2")
    assert dedup_corpus.main(["--out", out2, "--state", state, "--remove", ids_f]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["removed"] == 1 and m["n_docs"] == 2
    keep_ids = {r.doc_id for r in spark.read.parquet(f"{out2}/keep").collect()}
    assert 0 not in keep_ids and 1 in keep_ids  # doc 1 re-elected

    # next batch: an exact copy of the REMOVED doc's text must cluster with
    # the surviving copy (doc 1), never resurrect doc 0
    out3 = os.path.join(tmpdir_path, "rm_out3")
    p_b2 = os.path.join(tmpdir_path, "rm_b2.parquet")
    spark.createDataFrame(
        [(10, b1[0][1])], "doc_id long, text string"
    ).write.parquet(p_b2)
    assert dedup_corpus.main(["--docs", p_b2, "--out", out3, "--state", state]) == 0
    capsys.readouterr()
    clusters = {r.doc_id: r.cluster_id
                for r in spark.read.parquet(f"{out3}/clusters").collect()}
    assert 0 not in clusters
    assert clusters[10] == clusters[1] == 1


def _fabricate_state(spark, state_dir, meta: dict, hashes=None):
    """Hand-built state dir: assign {1,2,3} one cluster, pair history holds
    only the star edges through hub 1 ((1,2), (1,3))."""
    from kgforge import fsio

    fs = fsio.get_fs(state_dir)
    fs.makedirs(state_dir)
    spark.createDataFrame(
        [(1, 1, True), (2, 1, False), (3, 1, False)],
        "doc_id long, cluster_id long, is_canonical boolean",
    ).write.parquet(os.path.join(state_dir, "assign"))
    spark.createDataFrame([(1, 2), (1, 3)], "a long, b long").write.parquet(
        os.path.join(state_dir, "pairs")
    )
    if hashes is not None:
        spark.createDataFrame(hashes, "doc_id long, md5 string").write.parquet(
            os.path.join(state_dir, "hashes")
        )
    fs.write_text(os.path.join(state_dir, "_META.json"), json.dumps(meta))


def test_upgraded_state_without_format_falls_back_to_merge(spark, tmpdir_path):
    """ADVICE r5: a state whose _META predates the pairs/ format (no
    "format" key) may hold a PARTIAL pair history — early-batch edges were
    never recorded — so --remove must use the conservative relabel instead
    of splitting on incomplete connectivity."""
    state = os.path.join(tmpdir_path, "old_state")
    _fabricate_state(
        spark, state, {"method": "minhash"},  # pre-format meta (upgraded state)
        hashes=[(1, "ha"), (2, "hb"), (3, "hc")],
    )
    removed = spark.createDataFrame([(1,)], "doc_id long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.incremental_dedup_remove(spark, removed, state).collect()}
    # conservative merge: 2 and 3 stay ONE cluster relabeled to min survivor
    assert out[2] == (2, True) and out[3] == (2, False)


def test_format2_state_splits_bridged_cluster_on_removal(spark, tmpdir_path):
    """Same fabricated state but format 2 (complete pair history) and
    distinct content: removing hub 1 splits {2} / {3}."""
    state = os.path.join(tmpdir_path, "new_state")
    _fabricate_state(
        spark, state, {"method": "minhash", "format": dedup.STATE_FORMAT},
        hashes=[(1, "ha"), (2, "hb"), (3, "hc")],
    )
    removed = spark.createDataFrame([(1,)], "doc_id long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.incremental_dedup_remove(spark, removed, state).collect()}
    assert out[2] == (2, True) and out[3] == (3, True)


def test_hub_removal_cannot_strand_exact_copies(spark, tmpdir_path):
    """Round 6: the pairs/ history is star-compressed (docs 2 and 3 link
    only to hub 1, never to each other), so removing the hub used to strand
    two IDENTICAL docs into two canonical keepers.  The split now re-derives
    content star edges from hashes/ — {2,3} must stay one cluster."""
    state = os.path.join(tmpdir_path, "hub_state")
    _fabricate_state(
        spark, state, {"method": "minhash", "format": dedup.STATE_FORMAT},
        hashes=[(1, "same"), (2, "same"), (3, "same")],  # all exact copies
    )
    removed = spark.createDataFrame([(1,)], "doc_id long")
    out = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in dedup.incremental_dedup_remove(spark, removed, state).collect()}
    assert out[2] == (2, True) and out[3] == (2, False), (
        "identical survivors must share one cluster after hub removal"
    )


# --- incremental embedding-LSH method (round 6, VERDICT r5 item 4) ----------

def _unit_vec(i, eps=0.0, dim=8):
    import numpy as np

    v = np.zeros(dim)
    v[i % dim] = 1.0
    if eps:
        v[(i + 1) % dim] = eps
    v = v / np.linalg.norm(v)
    return [float(round(x, 6)) for x in v]


def test_incremental_embed_pairs_union_matches_oneshot_clusters(spark):
    """Batch-union connectivity == one-shot lsh_near_pairs connectivity on a
    well-separated fixture (the quantized verify differs from the raw-float
    one only within the int8 error band, far from these cosines); exact
    cross-batch copies link through the band+qvec state; identical vectors
    within a batch star-compress."""
    from kgforge.operators import similarity

    schema = "doc_id long, embedding array<double>"
    b1 = [(0, _unit_vec(0)), (1, _unit_vec(0, 0.05)), (2, _unit_vec(1))]
    b2 = [(10, _unit_vec(0)), (11, _unit_vec(1, 0.05)), (12, _unit_vec(3)),
          (13, _unit_vec(3))]
    d1 = spark.createDataFrame(b1, schema)
    d2 = spark.createDataFrame(b2, schema)
    full = d1.unionByName(d2)
    empty_b = spark.createDataFrame([], "doc_id long, band int, key long")
    empty_q = spark.createDataFrame([], "doc_id long, scale double, qvec array<int>")
    kw = dict(threshold=0.8, id_col="doc_id", vec_col="embedding", dim=8)
    p1, nb1, nq1 = similarity.incremental_embed_pairs(d1, empty_b, empty_q, **kw)
    p2, _, nq2 = similarity.incremental_embed_pairs(d2, nb1, nq1, **kw)
    union_pairs = p1.select("a", "b").unionByName(p2.select("a", "b"))
    got = {(r.doc_id, r.cluster_id, r.is_canonical)
           for r in dedup.dedup_clusters(full, pairs=union_pairs).collect()}
    oneshot = similarity.lsh_near_pairs(
        full, threshold=0.8, id_col="doc_id", vec_col="embedding", dim=8
    )
    want = {(r.doc_id, r.cluster_id, r.is_canonical)
            for r in dedup.dedup_clusters(full, pairs=oneshot).collect()}
    assert got == want
    p2_rows = {(r.a, r.b): r.cosine for r in p2.collect()}
    assert all(a >= 10 or b >= 10 for a, b in p2_rows)  # >= 1 new doc each
    assert p2_rows.get((0, 10)) == 1.0  # exact cross-batch copy via state
    assert p2_rows.get((12, 13)) == 1.0  # within-batch star compression
    assert nq2.count() == len(b2)  # one quantized row per batch doc


def test_embed_tombstoned_rep_reelects_in_state(spark, tmpdir_path):
    """Removing an identical-vector group's rep must not orphan the group:
    reps re-derive from the surviving evecs/ rows each batch, so a later
    identical vector links to the min surviving member.  Texts are all
    DISTINCT to isolate the embedding path from the hashes/ exact links."""
    state = os.path.join(tmpdir_path, "em_state")
    d1 = spark.createDataFrame(
        [(0, "text zero"), (1, "text one"), (4, "text four")],
        "doc_id long, text string",
    )
    e1 = spark.createDataFrame(
        [(0, _unit_vec(0)), (1, _unit_vec(0)), (4, _unit_vec(2))],
        "doc_id long, embedding array<double>",
    )
    dedup.incremental_dedup_update(spark, d1, state, method="embed", embeddings=e1)
    dedup.incremental_dedup_remove(
        spark, spark.createDataFrame([(0,)], "doc_id long"), state
    )
    d2 = spark.createDataFrame([(10, "text ten")], "doc_id long, text string")
    e2 = spark.createDataFrame(
        [(10, _unit_vec(0))], "doc_id long, embedding array<double>"
    )
    assign = {r.doc_id: r.cluster_id
              for r in dedup.incremental_dedup_update(
                  spark, d2, state, method="embed", embeddings=e2).collect()}
    assert 0 not in assign
    assert assign[10] == assign[1] == 1  # re-elected survivor anchors the group
    assert assign[4] == 4


def test_embed_state_requires_embeddings(spark, tmpdir_path):
    d = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="requires the batch's embeddings"):
        dedup.incremental_dedup_update(
            spark, d, os.path.join(tmpdir_path, "e_state"), method="embed"
        )


def test_incremental_state_embed_cli_matches_oneshot(spark, tmpdir_path, capsys):
    """--state with --method embed: two batches must end with the same
    clusters as a one-shot embed run over the full corpus (64-dim vectors:
    the CLI's one-shot path uses the default plane dimensionality)."""
    import dedup_corpus

    docs_rows = [(i, f"document number {i} body") for i in (0, 1, 2, 10, 11)]
    emb_rows = [
        (0, _unit_vec(0, dim=64)), (1, _unit_vec(0, 0.05, dim=64)),
        (2, _unit_vec(1, dim=64)),
        (10, _unit_vec(0, dim=64)), (11, _unit_vec(5, dim=64)),
    ]
    emb_p = os.path.join(tmpdir_path, "em_vecs.parquet")
    spark.createDataFrame(emb_rows, "vec_id long, embedding array<double>").write.parquet(emb_p)
    paths = {}
    for name, ids in (("b1", (0, 1, 2)), ("b2", (10, 11)), ("full", (0, 1, 2, 10, 11))):
        rows = [r for r in docs_rows if r[0] in ids]
        p = os.path.join(tmpdir_path, f"em_{name}.parquet")
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
        paths[name] = p
    state = os.path.join(tmpdir_path, "em_cli_state")
    out1, out2, out_full = (os.path.join(tmpdir_path, f"em_out{i}") for i in range(3))
    common = ["--method", "embed", "--embeddings", emb_p]
    assert dedup_corpus.main(["--docs", paths["b1"], "--out", out1, "--state", state, *common]) == 0
    assert dedup_corpus.main(["--docs", paths["b2"], "--out", out2, "--state", state, *common]) == 0
    assert dedup_corpus.main(["--docs", paths["full"], "--out", out_full, *common]) == 0
    capsys.readouterr()
    got = {(r.doc_id, r.cluster_id, r.is_canonical)
           for r in spark.read.parquet(os.path.join(out2, "clusters")).collect()}
    want = {(r.doc_id, r.cluster_id, r.is_canonical)
            for r in spark.read.parquet(os.path.join(out_full, "clusters")).collect()}
    assert got == want
    by_doc = {d: c for d, c, _ in got}
    assert by_doc[10] == 0 and by_doc[1] == 0  # exact + near dup joined via state
