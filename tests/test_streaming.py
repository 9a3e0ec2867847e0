"""Structured-Streaming tests: incremental file ingest (exactly-once across
restarts) and windowed aggregation with a memory sink."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kgforge.corpus import generate_rows
from kgforge.streaming.incremental import (
    dedup_within_watermark,
    run_incremental,
    run_incremental_graph,
    windowed_event_counts,
)


def _write_chunk(dirpath: str, name: str, rows: list) -> None:
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(dirpath, name))


def test_incremental_ingest_exactly_once(spark, tmpdir_path):
    src = os.path.join(tmpdir_path, "src")
    out = os.path.join(tmpdir_path, "out")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    rows, _ = generate_rows(400)

    _write_chunk(src, "a.parquet", rows[:200])
    run_incremental(spark, src, out, ckpt)
    n1 = spark.read.parquet(f"{out}/parsed").count()
    assert n1 > 0

    # restart with the SAME checkpoint: no new files -> no new rows
    run_incremental(spark, src, out, ckpt)
    assert spark.read.parquet(f"{out}/parsed").count() == n1

    # second batch of files arrives -> only the delta is processed
    _write_chunk(src, "b.parquet", rows[200:])
    run_incremental(spark, src, out, ckpt)
    n2 = spark.read.parquet(f"{out}/parsed").count()
    assert n2 > n1

    # the union must equal a one-shot batch run over all files
    from kgforge.operators.extract import extract_parse_df, prefilter, with_content_sha

    batch = extract_parse_df(prefilter(with_content_sha(spark.read.parquet(src))))
    assert n2 == batch.count()


def test_incremental_graph_merges_microbatches(spark, tmpdir_path):
    """Continuous KG construction: the graph table after streaming two file
    tranches must equal the batch graph over the union, and a restart with
    no new files must leave it untouched."""
    from kgforge.operators.extract import extract_parse_df, prefilter, with_content_sha
    from kgforge.operators.linking import link_terms
    from kgforge.operators.triples import explode_tps, graph_triples
    from kgforge.pipeline import default_entity_dict

    src = os.path.join(tmpdir_path, "gsrc")
    graph = os.path.join(tmpdir_path, "graph")
    ckpt = os.path.join(tmpdir_path, "gckpt")
    rows, _ = generate_rows(400)

    _write_chunk(src, "a.parquet", rows[:200])
    run_incremental_graph(spark, src, graph, ckpt)
    g1 = {(r.subj, r.pred, r.obj): r.src_count for r in spark.read.parquet(graph).collect()}

    # restart, no new files: graph unchanged (ledger + stream checkpoint)
    run_incremental_graph(spark, src, graph, ckpt)
    g1b = {(r.subj, r.pred, r.obj): r.src_count for r in spark.read.parquet(graph).collect()}
    assert g1b == g1

    _write_chunk(src, "b.parquet", rows[200:])
    run_incremental_graph(spark, src, graph, ckpt)
    merged = {(r.subj, r.pred, r.obj): r.src_count for r in spark.read.parquet(graph).collect()}

    ed = default_entity_dict(spark)
    batch_graph = graph_triples(
        link_terms(
            explode_tps(extract_parse_df(prefilter(with_content_sha(spark.read.parquet(src))))),
            ed,
        )
    )
    expected = {(r.subj, r.pred, r.obj): r.src_count for r in batch_graph.collect()}
    assert merged == expected

    # recreating the stream checkpoint re-numbers epochs from 0 AND
    # redelivers every file — the ledger guard must fail loudly instead of
    # silently skipping (data loss) or re-merging (double count)
    import shutil

    shutil.rmtree(ckpt)
    with pytest.raises(RuntimeError, match="different stream checkpoint"):
        run_incremental_graph(spark, src, graph, ckpt)


@pytest.fixture()
def events_stream(spark, tmpdir_path):
    # file streaming sources require a DIRECTORY; stage the single parquet file
    d = os.path.join(tmpdir_path, "events_dir")
    os.makedirs(d, exist_ok=True)
    os.symlink("/root/testdata/sf0.001/events.parquet", os.path.join(d, "events.parquet"))
    return (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def _drain(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_windowed_agg_matches_batch(spark, events_stream):
    _drain(windowed_event_counts(events_stream, watermark="0 seconds"), "win_out")
    got = {
        (r.day, r.event_type): (r.n, r.total)
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "event_type", "n", "total")
    )
    # append-mode emits only windows closed by the watermark; every emitted
    # window must match the batch result exactly
    expect = {(r.day, r.event_type): (r.n, r.total) for r in batch.collect()}
    assert got
    for k, v in got.items():
        assert expect[k] == v


def test_stateful_running_stats_matches_batch(spark, tmpdir_path):
    """applyInPandasWithState keyed state: stream the events table as TWO
    micro-batches (state must carry across them); the LAST emitted row per
    user must equal the batch groupBy totals (update mode re-emits a user's
    row whenever a batch touches it)."""
    from kgforge.streaming.incremental import running_user_stats

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    d = os.path.join(tmpdir_path, "ev2")
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(d + "/a")
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(d + "/b")
    import glob
    import shutil

    os.makedirs(d + "/src", exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(d + "/*/part-*.parquet"))):
        shutil.copy(f, f"{d}/src/{i}.parquet")
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/src")
    )
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM stateful_out").collect()
    # keep the last emission per user (monotone n_events makes max == last)
    got = {}
    for r in rows:
        if r.user_id not in got or r.n_events > got[r.user_id][0]:
            got[r.user_id] = (r.n_events, r.total_value)
    batch = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    expect = {r.user_id: (r.n, r.total) for r in batch.collect()}
    assert got == expect


def test_streaming_dedup(spark, events_stream):
    _drain(dedup_within_watermark(events_stream), "dedup_out")
    n = spark.sql("SELECT count(*) AS n FROM dedup_out").collect()[0].n
    distinct_ids = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert n == distinct_ids


def test_incremental_bgp_view_equals_oneshot(spark, tmpdir_path):
    """Materialized SPARQL view over a triple stream: the maintained bag
    == the one-shot query over everything ingested; redelivery/restart is
    a no-op; out-of-subset queries reject BEFORE the stream starts."""
    import glob
    import random
    import shutil

    from kgforge.sparql.eval import answer_sparql
    from kgforge.streaming.incremental import run_incremental_bgp_view

    rng = random.Random(3)
    ents = [f"e{i}" for i in range(10)]
    rows = sorted(
        {(rng.choice(ents), rng.choice(["p", "q"]), rng.choice(ents)) for _ in range(80)}
    )
    rng.shuffle(rows)
    schema = "subj string, pred string, obj string"
    src = os.path.join(tmpdir_path, "src")
    os.makedirs(src)
    n = 0
    for i in range(3):
        wave = os.path.join(tmpdir_path, f"wave{i}")
        spark.createDataFrame(rows[i * 27:(i + 1) * 27], schema).coalesce(1).write.parquet(wave)
        for f in glob.glob(f"{wave}/part-*.parquet"):
            shutil.move(f, os.path.join(src, f"file{n}.parquet"))
            n += 1
    q = 'SELECT ?a ?c WHERE { ?a <p> ?b . ?b <q> ?c FILTER(?c != "e3") }'
    state, ckpt = os.path.join(tmpdir_path, "state"), os.path.join(tmpdir_path, "ckpt")
    run_incremental_bgp_view(spark, src, state, ckpt, q, max_files_per_batch=1)
    got = sorted(tuple(r) for r in spark.read.parquet(state + "/solutions").collect())
    full = spark.createDataFrame(rows[:81], schema)
    want = sorted(tuple(r) for r in answer_sparql(full, q).collect())
    assert got == want and len(got) > 0
    # restart with the same checkpoint: ledger skips everything
    run_incremental_bgp_view(spark, src, state, ckpt, q, max_files_per_batch=1)
    got2 = sorted(tuple(r) for r in spark.read.parquet(state + "/solutions").collect())
    assert got2 == got
    with pytest.raises(NotImplementedError):
        run_incremental_bgp_view(
            spark, src, os.path.join(tmpdir_path, "s2"), os.path.join(tmpdir_path, "c2"),
            "SELECT DISTINCT ?a WHERE { ?a <p> ?b }",
        )
