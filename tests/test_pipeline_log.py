"""EP-A/EP-B/EP-C parity tests: raw log file -> entries / ranking / stats,
same-client dedup, endpoint validation seam."""

import gzip
import os
from urllib.parse import quote_plus

import pytest
from pyspark.sql import functions as F

from kgforge.corpus import POOL_BY_ID
from kgforge.endpoint import deterministic_fake_executor, http_executor, validate_entries
from kgforge.pipeline_log import run_log

Q1 = POOL_BY_ID["q02"].text
Q2 = POOL_BY_ID["q14"].text
Q2_VARIANT = POOL_BY_ID["q14"].variants[0]


def _line(ip, day, hh, q):
    return (
        f'{ip} - - [{day}/Aug/2026:{hh}:00:01 +0000] '
        f'"GET /sparql?query={quote_plus(q)} HTTP/1.1" 200 999 "-" "a"'
    )


@pytest.fixture(scope="module")
def log_out(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("log"))
    lines = [
        _line("1.1.1.1", 14, 10, Q1),
        _line("1.1.1.1", 14, 11, Q1),      # same-client repeat -> dup
        _line("2.2.2.2", 14, 10, Q1),      # other client keeps it
        _line("1.1.1.1", 15, 10, Q2),
        _line("3.3.3.3", 15, 11, Q2_VARIANT),  # same canonical BGP as Q2
        _line("4.4.4.4", 15, 12, "SELECT broken {"),  # reject
        "not a log line at all",
        _line("5.5.5.5", 15, 13, Q1).replace("GET /sparql?query=", "GET /other?x="),
    ]
    # gzip input: the reference consumed .gz logs; spark.read.text is transparent
    path = os.path.join(d, "access.log.gz")
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines))
    out = os.path.join(d, "out")
    metrics = run_log(spark, path, out)
    return out, metrics


def test_log_metrics(log_out):
    _, m = log_out
    assert m["n_lines"] == 8
    assert m["n_hits"] == 6           # 6 /sparql?query= hits
    assert m["n_dups"] == 1           # the same-client repeat
    assert m["n_rejected"] == 1       # the broken query
    assert m["n_ok"] == 4             # 6 - dup - reject
    assert m["n_distinct_bgps"] == 2  # Q1-bgp and Q2-bgp (variant collapses)


def test_per_date_partitioning(spark, log_out):
    out, _ = log_out
    dirs = {p for p in os.listdir(f"{out}/entries") if p.startswith("ds=")}
    assert dirs == {"ds=2026-08-14", "ds=2026-08-15"}


def test_ranking_collapses_variants(spark, log_out):
    out, _ = log_out
    ranking = {r.bgp_hash: r["count"] for r in spark.read.parquet(f"{out}/ranking").collect()}
    assert sorted(ranking.values()) == [2, 2]  # Q1 x2 (dedup'd), Q2+variant x2


def test_validation_seam(spark, log_out):
    out, _ = log_out
    entries = spark.read.parquet(f"{out}/entries")
    v = validate_entries(entries, deterministic_fake_executor)
    rows = v.filter("parse_ok").select("query", "endpoint_empty", "endpoint_error").collect()
    assert rows
    # deterministic: same query text -> same verdict everywhere
    verd = {}
    for r in rows:
        key = r.query
        val = (r.endpoint_empty, r.endpoint_error)
        assert verd.setdefault(key, val) == val
    # distinct-query execution: validating N entries calls the executor only
    # once per distinct query (counted via a counting executor)
    calls = []

    def counting(q):
        calls.append(q)
        return (False, None)

    validate_entries(entries, counting).collect()
    assert len(calls) == len(set(calls))


def test_http_executor_is_a_clear_seam():
    with pytest.raises(NotImplementedError, match="no network"):
        http_executor("http://dbpedia.org/sparql")("SELECT ?s WHERE { ?s ?p ?o }")
