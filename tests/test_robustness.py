"""Regression tests for the round-1 ADVICE findings: malformed input must
degrade to counted rejects / NULLs, never abort a Spark stage; interrupted
stage-1 runs must not duplicate rows on resume."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgforge.sparql.parser import parse_query


# --- parser never raises -----------------------------------------------------

@pytest.mark.parametrize(
    "text",
    [
        'SELECT ?x WHERE { ?x ?p "a\\uZZZZ" }',            # bad hex in \u escape
        'SELECT ?x WHERE { ?x ?p "a\\u12" }',               # truncated \u escape
        'SELECT ?x WHERE { ?x ?p "a\\U0012" }',             # truncated \U escape
        'SELECT ?x WHERE { ?x ?p "a\\UFFFFFFFF" }',         # out-of-range codepoint
        'SELECT ?x WHERE { ?x ?p "\\u0041ok" }',            # valid escape still works
    ],
)
def test_parse_query_never_raises_on_bad_escapes(text):
    r = parse_query(text)  # must not raise, whatever the verdict
    assert isinstance(r.parse_ok, bool)


def test_valid_unicode_escape_decodes():
    r = parse_query('SELECT ?x WHERE { ?x ?p "\\u0041\\U00000042" }')
    assert r.parse_ok
    assert r.tps[0].o.value == "AB"


def test_bad_escape_falls_back_to_raw_chars():
    r = parse_query('SELECT ?x WHERE { ?x ?p "a\\uZZZZ" }')
    assert r.parse_ok  # degraded, not fatal: escape kept as raw chars
    assert "ZZZZ" in r.tps[0].o.value


# --- log reader quarantines malformed percent-encoding ------------------------

def test_malformed_url_encoding_quarantined_not_fatal(spark, tmpdir_path):
    from kgforge.sources.logs import read_apache_log

    good = (
        '1.2.3.4 - - [15/Aug/2026:10:00:00 +0200] '
        '"GET /sparql?query=SELECT%20%3Fs%20WHERE%20%7B%3Fs%20%3Fp%20%3Fo%7D HTTP/1.1" 200 123'
    )
    bad = (
        '5.6.7.8 - - [15/Aug/2026:10:00:01 +0200] '
        '"GET /sparql?query=SELECT%ZZ%3Fs HTTP/1.1" 400 0'
    )
    p = os.path.join(tmpdir_path, "access.log")
    with open(p, "w") as f:
        f.write(good + "\n" + bad + "\n")
    rows = read_apache_log(spark, p).select("ip", "query").collect()  # must not abort
    by_ip = {r.ip: r.query for r in rows}
    assert by_ip["1.2.3.4"] is not None and "WHERE" in by_ip["1.2.3.4"]
    assert by_ip["5.6.7.8"] is None  # undecodable -> NULL (counted reject)


# --- stage-1 crash between parsed write and mark_done --------------------------

def test_crash_before_mark_done_does_not_duplicate_rows(spark, tmpdir_path):
    """Simulate a crash AFTER the parsed write but BEFORE the checkpoint
    commit: the crashed attempt's rows must be INVISIBLE to every reader
    (snapshot visibility via committed (pid, attempt) pairs), so the resumed
    run's output contains each mention exactly once."""
    from kgforge.catalog import ParquetCatalog
    from kgforge.checkpoint import CheckpointStore
    from kgforge.corpus import generate_rows
    from kgforge.pipeline import _read_parsed, run

    rows, _ = generate_rows(200)
    src_path = os.path.join(tmpdir_path, "src")
    os.makedirs(src_path, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(src_path, "part-0.parquet"))
    src = spark.read.parquet(src_path)
    out = os.path.join(tmpdir_path, "out")

    real_mark_done = CheckpointStore.mark_done
    CheckpointStore.mark_done = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("injected"))
    try:
        with pytest.raises(RuntimeError, match="injected"):
            run(spark, src, out, n_parts=8, resume=True, run_id="crashy")
    finally:
        CheckpointStore.mark_done = real_mark_done

    # rerun to completion; the committed view holds each mention exactly once
    m = run(spark, src, out, n_parts=8, resume=True, run_id="crashy2")
    cat = ParquetCatalog(out)
    store = CheckpointStore(spark, cat.path("checkpoints"))
    parsed = _read_parsed(spark, cat, store)
    dup = parsed.groupBy("content_sha256", "span_start", "kind").count().filter("count > 1")
    assert dup.count() == 0
    assert m["n_mentions"] == parsed.count()
    # the physical table DOES hold the crashed attempt's rows (append-only);
    # visibility, not deletion, is what provides idempotency
    physical = spark.read.parquet(os.path.join(out, "parsed")).count()
    assert physical >= parsed.count()


# --- streaming epoch writes are idempotent -------------------------------------

def test_streaming_epoch_write_is_idempotent(spark, tmpdir_path):
    """Re-invoking the foreachBatch body with the same epoch_id (a retried
    micro-batch) must replace, not duplicate, that epoch's output."""
    from kgforge.operators.extract import extract_parse_df, prefilter, with_content_sha
    from kgforge.corpus import generate_rows

    rows, _ = generate_rows(60)
    src = spark.createDataFrame(rows)
    out = os.path.join(tmpdir_path, "out")

    def process_batch(batch_df, epoch_id):
        parsed = extract_parse_df(prefilter(with_content_sha(batch_df)))
        parsed.write.mode("overwrite").parquet(f"{out}/parsed/epoch={epoch_id}")

    process_batch(src, 0)
    n1 = spark.read.parquet(f"{out}/parsed").count()
    process_batch(src, 0)  # simulated retry of the same epoch
    assert spark.read.parquet(f"{out}/parsed").count() == n1


def test_pipeline_survives_adversarial_content(spark, tmpdir_path):
    """Codifies the /verify adversarial probe: unicode literals, 5000-deep
    nesting (RecursionError -> counted reject, not a dead stage), '}' inside
    literals, 100 kB lines, and a negated-path reject — the pipeline must
    complete, count rejects, and resume to identical numbers."""
    import os

    from kgforge import pipeline

    rows = [
        {"repo": "r", "path": "a.rq", "commit": "c1", "lang": "sparql",
         "content": 'SELECT ?s WHERE { ?s <http://p> "é中文 \\u2603" }'},
        {"repo": "r", "path": "b.rq", "commit": "c2", "lang": "sparql",
         "content": "SELECT ?s WHERE " + "{" * 5000},
        {"repo": "r", "path": "c.rq", "commit": "c3", "lang": "sparql",
         "content": 'ASK { ?s <http://p> "}" }'},
        {"repo": "r", "path": "d.txt", "commit": "c4", "lang": "txt",
         "content": "SELECT ?x WHERE { ?x <http://p> ?y } " + "z" * 100_000},
        {"repo": "r", "path": "e.rq", "commit": "c5", "lang": "sparql",
         "content": "SELECT ?x WHERE { ?x <http://p>? ?y . ?x !<http://q> ?z }"},
    ]
    src = spark.createDataFrame(rows)
    out = os.path.join(tmpdir_path, "adversarial")
    m = pipeline.run(spark, src, out, n_parts=4, run_id="adv1")
    assert m["n_mentions"] == 4  # the 5000-brace block never balances
    assert m["n_parse_ok"] == 3  # unicode, literal-brace, huge-line parse
    assert m["n_fixture_triples"] == 3
    m2 = pipeline.run(spark, src, out, n_parts=4, resume=True, run_id="adv2")
    assert (m2["n_mentions"], m2["n_parse_ok"]) == (4, 3)
