"""pack_corpus CLI (jobs/pack_corpus.py): packs/manifest outputs and the
one-line JSON metrics, over a corpus with planted long documents."""

import json
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
)

BUDGET = 64


@pytest.fixture()
def docs_path(spark, tmpdir_path):
    rows = [(i, "tok " * (10 + i * 7)) for i in range(20)]
    rows.append((100, "long " * 500))  # 500 tokens -> 8 chunks at budget 64
    p = os.path.join(tmpdir_path, "pdocs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    return p


def _run(docs_path, out, capsys, *extra):
    import pack_corpus

    rc = pack_corpus.main(["--docs", docs_path, "--out", out, *extra])
    assert rc == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_chunked_packing_invariants(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "p_out")
    m = _run(docs_path, out, capsys, "--budget", str(BUDGET), "--bins", "2")
    assert m["n_docs"] == 21 and m["n_oversize"] == 0
    assert m["n_units"] > 21  # the long doc split into multiple chunks
    packs = spark.read.parquet(os.path.join(out, "packs"))
    # every unit exactly once; no pack over budget; long doc spans 8 chunks
    assert packs.count() == packs.select("unit_id").distinct().count()
    assert packs.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).filter(
        F.col("t") > BUDGET
    ).count() == 0
    assert packs.filter("doc_id = 100").count() == 8
    man = spark.read.parquet(os.path.join(out, "manifest"))
    assert man.count() == m["n_packs"]
    assert man.filter(F.col("fill") > 1.0).count() == 0
    assert 0 < m["fill_mean"] <= 1.0


def test_no_chunk_flags_oversize(spark, docs_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "p_noc")
    m = _run(docs_path, out, capsys, "--budget", str(BUDGET), "--no-chunk")
    assert m["n_units"] == 21 and m["n_oversize"] >= 1  # the 500-token doc
    packs = spark.read.parquet(os.path.join(out, "packs"))
    over = packs.filter("oversize").collect()
    assert {r.doc_id for r in over} and all(r.n_tokens > BUDGET for r in over)


def test_regex_tokenizer_cli(spark, tmpdir_path, capsys):
    """--tokenizer regex: punctuation-dense docs budget by regex tokens
    (commas count), chunks and packs share the counter, no pack exceeds
    the budget under it."""
    rows = [(i, ",".join("tok" for _ in range(10 + i * 30))) for i in range(8)]
    p = os.path.join(tmpdir_path, "rdocs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    out = os.path.join(tmpdir_path, "p_re")
    m = _run(p, out, capsys, "--budget", str(BUDGET), "--bins", "2",
             "--tokenizer", "regex")
    assert m["tokenizer"] == "regex" and m["n_oversize"] == 0
    # doc 7: 220 words + 219 commas = 439 regex tokens -> 7 chunks @ 64;
    # whitespace would see ONE token (no spaces anywhere)
    packs = spark.read.parquet(os.path.join(out, "packs"))
    assert packs.filter("doc_id = 7").count() == 7
    assert packs.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).filter(
        F.col("t") > BUDGET
    ).count() == 0


def test_bpe_tokenizer_cli(spark, docs_path, tmpdir_path, capsys):
    """--tokenizer bpe: a model trains on the corpus, its merges persist
    under <out>/bpe_merges, chunking/packing budget on exact subword
    counts, and no pack exceeds the budget under that counter."""
    out = os.path.join(tmpdir_path, "p_bpe")
    m = _run(docs_path, out, capsys, "--budget", str(BUDGET), "--bins", "2",
             "--tokenizer", "bpe", "--bpe-merges", "100")
    assert m["tokenizer"] == "bpe" and m["n_oversize"] == 0
    merges = spark.read.parquet(os.path.join(out, "bpe_merges"))
    assert {"rank", "left", "right"} <= set(merges.columns)
    n_merges = merges.count()
    assert 0 < n_merges <= 100
    # the merge table is a valid model: re-encoding with it reproduces the
    # packed token totals ('tok'/'long' merge to single tokens fast)
    from kgforge.operators import tokenizer as tk

    model = tk.BPEModel.from_df(merges)
    enc = tk.encode_bpe(spark.read.parquet(docs_path), model)
    packs = spark.read.parquet(os.path.join(out, "packs"))
    tot_packed = packs.agg(F.sum("n_tokens")).head()[0]
    tot_enc = enc.agg(F.sum("n_tokens")).head()[0]
    assert tot_packed == tot_enc
    assert packs.groupBy("pack_id").agg(F.sum("n_tokens").alias("t")).filter(
        F.col("t") > BUDGET
    ).count() == 0
