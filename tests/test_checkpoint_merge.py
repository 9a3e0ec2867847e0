"""Behavioral coverage for the checkpoint store's last-write-wins contract —
the exact semantics an Iceberg ``MERGE INTO checkpoints ON (stage, kg_pid)``
would provide in production (kgforge/catalog.py IcebergCatalog).  The parquet
backend is append-only + latest-row-wins at read; these tests pin that the
resolved view equals true upsert (MERGE) semantics so swapping backends
cannot change resume behavior (VERDICT round 1 item 10)."""

import time

from pyspark.sql import functions as F

from kgforge.checkpoint import CHECKPOINT_SCHEMA, PID_COL, CheckpointStore


def _write(store, spark, rows):
    """Append raw checkpoint rows (stage, pid, status, updated_at ordering
    controlled by the test)."""
    df = spark.createDataFrame(rows, CHECKPOINT_SCHEMA)
    df.write.mode("append").parquet(store.path)


def _row(stage, pid, status, n_out, ts):
    return (stage, pid, status, f"a{ts}", -1, n_out, 0, 0, float(ts))


def _merge_oracle(rows):
    """Straight-line MERGE INTO semantics: upsert each batch in order;
    resolved state keyed on (stage, pid)."""
    state = {}
    for r in sorted(rows, key=lambda r: r[8]):  # apply in updated_at order
        state[(r[0], r[1])] = r
    return state


def test_resolved_view_equals_merge_upsert(spark, tmpdir_path):
    store = CheckpointStore(spark, tmpdir_path + "/cp")
    t = time.time()
    rows = [
        _row("parsed", 0, "done", 10, t + 1),
        _row("parsed", 1, "done", 11, t + 1),
        _row("parsed", 0, "done", 99, t + 2),     # re-run of pid 0: must win
        _row("parsed", 2, "done", 12, t + 2),
        _row("other", 0, "done", 5, t + 3),       # different stage: independent key
    ]
    for r in rows:
        _write(store, spark, [r])

    oracle = _merge_oracle(rows)
    resolved = (
        store.read()
        .groupBy("stage", PID_COL)
        .agg(F.max_by("n_out", "updated_at").alias("n_out"))
        .collect()
    )
    got = {(r.stage, r[PID_COL]): r.n_out for r in resolved}
    want = {k: v[5] for k, v in oracle.items()}
    assert got == want  # latest-row-wins == MERGE upsert result


def test_status_flip_reopens_partition(spark, tmpdir_path):
    """A later non-done row (e.g. an operator invalidating a partition) must
    make the pid pending again — MERGE WHEN MATCHED UPDATE semantics, not
    'done is sticky'."""
    store = CheckpointStore(spark, tmpdir_path + "/cp")
    t = time.time()
    _write(store, spark, [_row("parsed", 7, "done", 10, t + 1)])
    assert [r[PID_COL] for r in store.done_pids("parsed").collect()] == [7]
    _write(store, spark, [_row("parsed", 7, "pending", 0, t + 2)])
    assert store.done_pids("parsed").count() == 0

    src = spark.createDataFrame([(7, "x"), (8, "y")], f"{PID_COL} int, v string")
    pending = store.filter_pending(src, "parsed")
    assert {r[PID_COL] for r in pending.collect()} == {7, 8}


def test_done_pids_scoped_per_stage(spark, tmpdir_path):
    store = CheckpointStore(spark, tmpdir_path + "/cp")
    t = time.time()
    _write(store, spark, [_row("parsed", 1, "done", 1, t), _row("linked", 2, "done", 1, t)])
    assert {r[PID_COL] for r in store.done_pids("parsed").collect()} == {1}
    assert {r[PID_COL] for r in store.done_pids("linked").collect()} == {2}


def test_compact_preserves_semantics(spark, tmpdir_path):
    """Compaction keeps exactly the last-write-wins rows: done_pids and
    committed_attempts are identical before and after, superseded rows are
    physically gone, and further appends + resume keep working."""
    store = CheckpointStore(spark, tmpdir_path + "/cp")
    t = time.time()
    _write(store, spark, [
        _row("parsed", 0, "done", 10, t + 1),
        _row("parsed", 0, "done", 12, t + 3),      # supersedes
        _row("parsed", 1, "done", 11, t + 1),
        _row("parsed", 1, "pending", 0, t + 4),    # reopened
        _row("linked", 0, "done", 5, t + 2),
    ])
    before_done = {r[PID_COL] for r in store.done_pids("parsed").collect()}
    before_attempts = {
        (r[PID_COL], r.attempt) for r in store.committed_attempts("parsed").collect()
    }

    removed = store.compact()
    assert removed == 2  # two superseded rows dropped
    assert spark.read.parquet(store.path).count() == 3

    assert {r[PID_COL] for r in store.done_pids("parsed").collect()} == before_done
    assert {
        (r[PID_COL], r.attempt) for r in store.committed_attempts("parsed").collect()
    } == before_attempts
    assert {r[PID_COL] for r in store.done_pids("linked").collect()} == {0}

    # the store stays writable and last-write-wins after compaction
    _write(store, spark, [_row("parsed", 1, "done", 13, t + 9)])
    assert {r[PID_COL] for r in store.done_pids("parsed").collect()} == {0, 1}
    assert store.compact() == 1  # the appended row superseded the pending one
    assert store.compact() == 0  # now minimal


def test_compact_empty_store_is_noop(spark, tmpdir_path):
    store = CheckpointStore(spark, tmpdir_path + "/cp_none")
    assert store.compact() == 0
