"""Per-task commit granularity of the fused parse sink (VERDICT r2 item 6):
an interrupted stage-1 attempt loses one task, not the pending set — a rerun
of the same attempt id skips every committed task file without pulling its
input through the parser."""

import glob
import os

import pytest

from kgforge.checkpoint import with_pid
from kgforge.operators.extract import extract_parse_sink, prefilter, with_content_sha


@pytest.fixture(scope="module")
def source(spark):
    from kgforge.corpus import generate_rows

    rows, _ = generate_rows(400)
    # several partitions so "loses one task" is observable
    return spark.createDataFrame(rows).repartition(6)


def _run(spark, source, out, attempt):
    pending = with_pid(with_content_sha(source), 16)
    return extract_parse_sink(prefilter(pending), out, attempt).collect()


def test_rerun_same_attempt_skips_committed_tasks(spark, source, tmp_path):
    out = str(tmp_path / "parsed")
    s1 = _run(spark, source, out, "A")
    tasks1 = {r["task_id"] for r in s1}
    assert len(tasks1) >= 2 and not any(r["skipped"] for r in s1)
    n_rows_full = spark.read.parquet(out).count()
    files = sorted(glob.glob(os.path.join(out, "task-A-*.parquet")))
    assert len(files) == len(tasks1)  # one committed file per task

    # kill-mid-append: one task's file never committed
    os.remove(files[0])
    s2 = _run(spark, source, out, "A")
    skipped_tasks = {r["task_id"] for r in s2 if r["skipped"]}
    assert len(skipped_tasks) == len(files) - 1  # only the lost task re-ran
    # the re-run restores the identical table
    assert spark.read.parquet(out).count() == n_rows_full
    # per-pid stats from a skipped task's file read-back must equal the
    # stats a fresh run produced (the checkpoint store depends on this)
    def pid_stats(summary):
        agg = {}
        for r in summary:
            if r["kg_pid"] >= 0:
                st = agg.setdefault(r["kg_pid"], [0, 0])
                st[0] += r["n_rows"]
                st[1] ^= r["fp"]
        return agg

    assert pid_stats(s1) == pid_stats(s2)


def test_new_attempt_does_not_reuse_old_task_files(spark, source, tmp_path):
    out = str(tmp_path / "parsed")
    _run(spark, source, out, "A")
    s2 = _run(spark, source, out, "B")
    assert not any(r["skipped"] for r in s2)  # cross-attempt resume is pid-level
    # both attempts' rows coexist physically; visibility filtering is the
    # reader's job (pipeline._read_parsed)
    df = spark.read.parquet(out)
    assert df.select("kg_attempt").distinct().count() == 2


def test_partial_tmp_files_are_invisible_to_readers(spark, source, tmp_path):
    out = str(tmp_path / "parsed")
    _run(spark, source, out, "A")
    n = spark.read.parquet(out).count()
    # a crashed mid-write leaves only a hidden dot-file; readers must ignore it
    junk = os.path.join(out, ".task-A-dead-00099.tmp-deadbeef")
    with open(junk, "wb") as fh:
        fh.write(b"not parquet at all")
    assert spark.read.parquet(out).count() == n


def test_sha_invariant_preserved_through_sink(spark, source, tmp_path):
    import pyspark.sql.functions as F

    out = str(tmp_path / "parsed")
    _run(spark, source, out, "A")
    parsed = spark.read.parquet(out)
    src_sha = with_content_sha(source).select(
        "repo", "path", "commit", "content_sha256"
    )
    joined = parsed.select("repo", "path", "commit", "content_sha256").distinct().join(
        src_sha.withColumnRenamed("content_sha256", "src_sha"),
        ["repo", "path", "commit"],
    )
    assert joined.filter(F.col("content_sha256") != F.col("src_sha")).count() == 0


def test_fresh_run_purges_same_attempt_files(spark, source, tmp_path):
    """resume=False semantics: fresh=True removes the attempt's committed
    files first, so a recompute never skips and never doubles rows."""
    out = str(tmp_path / "parsed")
    _run(spark, source, out, "A")
    n1 = spark.read.parquet(out).count()
    pending = with_pid(with_content_sha(source), 16)
    s2 = extract_parse_sink(prefilter(pending), out, "A", fresh=True).collect()
    assert not any(r["skipped"] for r in s2)  # nothing reused
    assert spark.read.parquet(out).count() == n1  # rewritten, not appended


def test_changed_split_layout_purges_stale_files(spark, source, tmp_path):
    """The filename fingerprint covers the SPLIT COUNT: rerunning the same
    attempt with a different partition layout must re-parse everything
    (review finding: task N of a 6-split plan is not task N of a 3-split
    plan) and must not leave the old layout's rows behind."""
    out = str(tmp_path / "parsed")
    _run(spark, source, out, "A")
    n1 = spark.read.parquet(out).count()
    pending = with_pid(with_content_sha(source.repartition(3)), 16)
    s2 = extract_parse_sink(prefilter(pending), out, "A").collect()
    assert not any(r["skipped"] for r in s2)  # fingerprint mismatch: no reuse
    assert {r["task_id"] for r in s2} == {0, 1, 2}
    assert spark.read.parquet(out).count() == n1  # same rows, no duplication


def test_norerun_rerun_of_out_dir_does_not_double_output(spark, source, tmp_path):
    """Full-pipeline guard for the vouched-visibility scoping: re-running an
    already-complete out_dir with resume=False and a NEW run id must produce
    the same mention/fixture counts, not double them (stage 2 overlaps the
    new attempt's checkpoint commit, so without pid scoping both the old
    committed attempt and the new vouched attempt would be visible)."""
    from kgforge import pipeline

    out = str(tmp_path / "kg")
    m1 = pipeline.run(spark, source, out, n_parts=16, resume=False, run_id="A")
    m2 = pipeline.run(spark, source, out, n_parts=16, resume=False, run_id="B")
    assert m2["n_mentions"] == m1["n_mentions"]
    assert m2["n_fixture_triples"] == m1["n_fixture_triples"]
    assert m2["n_pending"] == m1["n_pending"] == 400
