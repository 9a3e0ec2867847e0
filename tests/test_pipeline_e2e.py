"""End-to-end gates (BASELINE.json): triple P/R >= 0.95 vs the independent
oracle, content-sha256 row invariant, and resume-equivalence."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from kgforge import pipeline
from kgforge.checkpoint import with_pid
from kgforge.corpus import generate_rows
from kgforge.operators.extract import with_content_sha
from tests.oracle import expected_triples

N_SMALL = 4000  # FIXTURES.md 'small'-class corpus (scaled for suite runtime)


@pytest.fixture(scope="module")
def corpus_rows():
    return generate_rows(N_SMALL)[0]


@pytest.fixture(scope="module")
def run_out(spark, corpus_rows, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_e2e"))
    src = spark.createDataFrame(corpus_rows)
    metrics = pipeline.run(spark, src, out, n_parts=16)
    return out, metrics


def _got_triples(spark, out):
    rows = spark.read.parquet(os.path.join(out, "triples_fixture")).collect()
    return {(r.subj, r.pred, r.obj, r.content_sha256) for r in rows}


def test_precision_recall_gate(spark, run_out):
    """[B:2]: P/R >= 0.95 on distinct (subj, pred, obj); we also hold the
    stricter provenance-keyed variant to the same gate."""
    out, _ = run_out
    got4 = _got_triples(spark, out)
    exp4 = expected_triples(N_SMALL)
    got3 = {(s, p, o) for s, p, o, _ in got4}
    exp3 = {(s, p, o) for s, p, o, _ in exp4}

    for got, exp in ((got3, exp3), (got4, exp4)):
        inter = got & exp
        precision = len(inter) / len(got)
        recall = len(inter) / len(exp)
        assert precision >= 0.95, f"precision {precision}: extras {list(got - exp)[:5]}"
        assert recall >= 0.95, f"recall {recall}: misses {list(exp - got)[:5]}"


def test_noise_rows_emit_nothing(spark, run_out, corpus_rows):
    """Precision guard: no triple may carry the sha of a noise/malformed row."""
    out, _ = run_out
    planted_shas = {s for _, _, _, s in expected_triples(N_SMALL)}
    got_shas = {
        r.content_sha256
        for r in spark.read.parquet(os.path.join(out, "triples_fixture"))
        .select("content_sha256")
        .distinct()
        .collect()
    }
    assert got_shas <= planted_shas


def test_content_sha_invariant(spark, corpus_rows):
    """[B:15]: Spark-side sha2 equals the reference hashlib sha per input row."""
    src = with_content_sha(spark.createDataFrame(corpus_rows[:500]))
    got = {r.path: r.content_sha256 for r in src.select("path", "content_sha256").collect()}
    for row in corpus_rows[:500]:
        expect = hashlib.sha256(row["content"].encode("utf-8")).hexdigest()
        assert got[row["path"]] == expect


def test_parse_reject_counting(spark, run_out):
    """Malformed inputs are counted rejects, never crashes (R:Stat.py)."""
    out, metrics = run_out
    q = spark.read.parquet(os.path.join(out, "quarantine"))
    assert q.agg(F.sum("n")).collect()[0][0] > 0
    assert metrics["n_parse_ok"] < metrics["n_mentions"]


def test_chunked_resume_mid_run(spark, corpus_rows, tmp_path_factory):
    """[B:14] finer-grained resume: simulate a crash between stage-1 chunks
    by running only chunk 0, then rerun chunked end-to-end — the rerun must
    skip the completed chunk's pids and the final output must equal an
    uninterrupted single-shot run."""
    from kgforge.catalog import ParquetCatalog
    from kgforge.checkpoint import CheckpointStore, PID_COL

    rows = corpus_rows[:1200]
    src = spark.createDataFrame(rows)
    out = str(tmp_path_factory.mktemp("kg_chunk"))
    ref_out = str(tmp_path_factory.mktemp("kg_chunk_ref"))

    # "crash" after the first of 4 chunks: run stage1 for chunk 0 only
    cat = ParquetCatalog(out)
    store = CheckpointStore(spark, cat.path("checkpoints"))
    pipeline.run_stage1(
        spark, src, cat, store, n_parts=16, resume=True, run_id="crash_c0",
        pid_filter=F.pmod(F.col(PID_COL), F.lit(4)) == 0,
    )
    done_before = {r[PID_COL] for r in store.done_pids("parsed").collect()}
    assert done_before  # chunk 0 committed its pids

    # rerun the whole job; completed pids must not be re-parsed
    pipeline.run_chunked(spark, src, out, n_parts=16, n_chunks=4, run_id="rerun")
    pipeline.run(spark, src, ref_out, n_parts=16, run_id="chunk_ref")
    assert _got_triples(spark, out) == _got_triples(spark, ref_out)

    parsed = spark.read.parquet(os.path.join(out, "parsed"))
    dupes = (
        parsed.groupBy("content_sha256", "span_start", "kind").count().filter("count > 1").count()
    )
    assert dupes == 0


def test_resume_equivalence(spark, corpus_rows, tmp_path_factory):
    """[B:14]: interrupt after some partitions -> resume -> identical output.
    Simulated by running half the pid space first, then the full source with
    resume=True; the second run must anti-join the done partitions and the
    union must equal a single uninterrupted run."""
    out = str(tmp_path_factory.mktemp("kg_resume"))
    ref_out = str(tmp_path_factory.mktemp("kg_ref"))
    rows = corpus_rows[:1000]
    src = spark.createDataFrame(rows)

    half = with_pid(src, 16).filter(F.col("kg_pid") < 8).drop("kg_pid")
    pipeline.run(spark, half, out, n_parts=16, run_id="half")
    m2 = pipeline.run(spark, src, out, n_parts=16, resume=True, run_id="rest")

    pipeline.run(spark, src, ref_out, n_parts=16, run_id="ref")

    got = _got_triples(spark, out)
    ref = _got_triples(spark, ref_out)
    assert got == ref
    # the resumed run must NOT have re-parsed the completed partitions:
    # parsed rows per (pid) appear exactly once
    parsed = spark.read.parquet(os.path.join(out, "parsed"))
    dupes = (
        parsed.groupBy("content_sha256", "span_start", "kind")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dupes == 0
