"""dedup_corpus CLI (jobs/dedup_corpus.py): cluster + keep outputs and the
one-line JSON metrics over a corpus with planted exact and near duplicates."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "the quick brown fox jumps over the lazy dog again and again today"),   # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near dup of 0
    (3, "completely different content about spark shuffles and parquet files"),
    (4, "numerical linear algebra kernels on tensor cores with mixed precision"),
]


@pytest.fixture()
def docs_path(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "docs.parquet")
    spark.createDataFrame(DOCS, "doc_id long, text string").write.parquet(p)
    return p


def _run(docs_path, out, capsys, *extra):
    import dedup_corpus

    rc = dedup_corpus.main(["--docs", docs_path, "--out", out, *extra])
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_minhash_cli_drops_near_and_exact_dups(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "out_minhash")
    m = _run(docs_path, out, capsys)
    assert m["n_docs"] == 5
    assert m["n_kept"] == 3 and m["n_dropped"] == 2  # 0,1,2 collapse to doc 0
    keep_ids = {r.doc_id for r in spark.read.parquet(f"{out}/keep").collect()}
    assert keep_ids == {0, 3, 4}
    clusters = {r.doc_id: r.cluster_id for r in spark.read.parquet(f"{out}/clusters").collect()}
    assert clusters[0] == clusters[1] == clusters[2] == 0


def test_embed_cli_clusters_identical_vectors(spark, docs_path, tmpdir_path, capsys):
    emb_path = os.path.join(tmpdir_path, "emb.parquet")
    v_dup = [1.0] + [0.0] * 63
    rows = [(i, v_dup if i in (0, 4) else [0.0] * i + [1.0] + [0.0] * (63 - i)) for i in range(5)]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>").write.parquet(emb_path)
    out = os.path.join(tmpdir_path, "out_embed")
    m = _run(docs_path, out, capsys, "--method", "embed", "--embeddings", emb_path)
    assert m["n_kept"] == 4 and m["n_dropped"] == 1  # 0 and 4 share a vector
    clusters = {r.doc_id: r.cluster_id for r in spark.read.parquet(f"{out}/clusters").collect()}
    assert clusters[0] == clusters[4] == 0


def test_exact_cli_keeps_near_dups(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "out_exact")
    m = _run(docs_path, out, capsys, "--method", "exact")
    assert m["n_kept"] == 4  # only the byte-identical pair collapses
    keep_ids = {r.doc_id for r in spark.read.parquet(f"{out}/keep").collect()}
    assert keep_ids == {0, 2, 3, 4}


def test_compact_cli(spark, tmpdir_path, capsys):
    """--compact applies the tombstone set physically and reports per-table
    drops; it refuses to run together with --docs."""
    import dedup_corpus

    state = os.path.join(tmpdir_path, "cc_state")
    p_b1 = os.path.join(tmpdir_path, "cc_b1.parquet")
    spark.createDataFrame(DOCS[:3], "doc_id long, text string").write.parquet(p_b1)
    out = os.path.join(tmpdir_path, "cc_out")
    assert dedup_corpus.main(["--docs", p_b1, "--out", out, "--state", state]) == 0
    ids_f = os.path.join(tmpdir_path, "cc_ids.txt")
    with open(ids_f, "w") as fh:
        fh.write("1\n")
    assert dedup_corpus.main(["--out", out, "--state", state, "--remove", ids_f]) == 0
    capsys.readouterr()
    assert dedup_corpus.main(["--out", out, "--state", state, "--compact"]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["compacted"] and m["rows_dropped"]["corpus"] == 1
    with pytest.raises(SystemExit):
        dedup_corpus.main(["--docs", p_b1, "--out", out, "--state", state, "--compact"])


def test_incremental_state_mode_matches_oneshot(spark, tmpdir_path, capsys):
    """Two --state batches must end with the same clusters/keep as one
    one-shot run over the full corpus."""
    import dedup_corpus

    b1 = DOCS[:3]
    b2 = [(10, DOCS[0][1]), (11, DOCS[3][1]), (12, "fresh unrelated topic entirely")]
    full = b1 + b2
    p_b1 = os.path.join(tmpdir_path, "inc_b1.parquet")
    p_b2 = os.path.join(tmpdir_path, "inc_b2.parquet")
    p_full = os.path.join(tmpdir_path, "inc_full.parquet")
    spark.createDataFrame(b1, "doc_id long, text string").write.parquet(p_b1)
    spark.createDataFrame(b2, "doc_id long, text string").write.parquet(p_b2)
    spark.createDataFrame(full, "doc_id long, text string").write.parquet(p_full)

    state = os.path.join(tmpdir_path, "inc_state")
    out1 = os.path.join(tmpdir_path, "inc_out1")
    out2 = os.path.join(tmpdir_path, "inc_out2")
    assert dedup_corpus.main(["--docs", p_b1, "--out", out1, "--state", state]) == 0
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["incremental"] and m1["n_docs"] == 3
    assert dedup_corpus.main(["--docs", p_b2, "--out", out2, "--state", state]) == 0
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m2["n_batch"] == 3 and m2["n_docs"] == 6

    out_full = os.path.join(tmpdir_path, "inc_out_full")
    assert dedup_corpus.main(["--docs", p_full, "--out", out_full]) == 0
    capsys.readouterr()
    got = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in spark.read.parquet(os.path.join(out2, "clusters")).collect()
    }
    want = {
        (r.doc_id, r.cluster_id, r.is_canonical)
        for r in spark.read.parquet(os.path.join(out_full, "clusters")).collect()
    }
    assert got == want
    # doc 10 (exact copy of doc 0, which lives in batch 1) joined cluster 0;
    # doc 11 copies DOCS[3]'s text but doc 3 is in NEITHER batch -> singleton
    by_doc = {d: c for d, c, _ in got}
    assert by_doc[10] == 0 and by_doc[11] == 11 and by_doc[12] == 12
