"""jobs/query_graph.py: the SPARQL query CLI over a triples parquet."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs"))

import query_graph  # noqa: E402

ROWS = [
    ("o1", "placed_by", "c1"), ("o2", "placed_by", "c1"), ("o3", "placed_by", "c2"),
    ("c1", "in_nation", "n5"), ("c2", "in_nation", "n3"),
    ("1", "next", "2"), ("2", "next", "3"), ("3", "next", "4"),
]


@pytest.fixture()
def triples_path(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "triples")
    spark.createDataFrame(ROWS, "subj string, pred string, obj string").write.parquet(p)
    return p


def _metrics(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_select_query_to_parquet(spark, triples_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "res")
    rc = query_graph.main(
        [
            "--triples", triples_path,
            "--query", "SELECT ?o ?n WHERE { ?o <placed_by>/<in_nation> ?n }",
            "--out", out,
        ]
    )
    assert rc == 0
    m = _metrics(capsys)
    assert m["n_rows"] == 3 and m["columns"] == ["o", "n"]
    got = {(r.o, r.n) for r in spark.read.parquet(out).collect()}
    assert got == {("o1", "n5"), ("o2", "n5"), ("o3", "n3")}


def test_query_file_and_show(triples_path, tmpdir_path, capsys):
    qf = os.path.join(tmpdir_path, "q.rq")
    with open(qf, "w") as fh:
        fh.write("ASK { ?x <in_nation> <n3> }")
    rc = query_graph.main(["--triples", triples_path, "--query-file", qf, "--show", "1"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[0]) == {"ask": True}
    assert json.loads(lines[-1])["n_rows"] == 1


def test_closure_mode(spark, triples_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "clo")
    rc = query_graph.main(
        ["--triples", triples_path, "--closure", "next", "--out", out]
    )
    assert rc == 0
    assert _metrics(capsys)["n_rows"] == 6  # all (i<j) pairs of the 4-chain
    preds = {r.pred for r in spark.read.parquet(out).collect()}
    assert preds == {"next+"}


def test_construct_to_ntriples(spark, triples_path, tmpdir_path, capsys):
    out = os.path.join(tmpdir_path, "nt")
    rc = query_graph.main(
        [
            "--triples", triples_path,
            "--query",
            "CONSTRUCT { ?n <has_order> ?o } WHERE { ?o <placed_by>/<in_nation> ?n }",
            "--out", out, "--format", "ntriples", "--base-iri", "http://kg.local/",
        ]
    )
    assert rc == 0
    assert _metrics(capsys)["n_rows"] == 3
    lines = {r.value for r in spark.read.text(out).collect()}
    assert "<http://kg.local/n5> <http://kg.local/has_order> <http://kg.local/o1> ." in lines


def test_ntriples_format_needs_triple_shape(triples_path, tmpdir_path, capsys):
    rc = query_graph.main(
        [
            "--triples", triples_path,
            "--query", "SELECT ?o ?c WHERE { ?o <placed_by> ?c }",
            "--out", os.path.join(tmpdir_path, "x"), "--format", "ntriples",
        ]
    )
    assert rc == 2


def test_out_of_subset_is_coded_reject(triples_path, capsys):
    rc = query_graph.main(
        [
            "--triples", triples_path,
            "--query", "SELECT ?s WHERE { GRAPH ?g { ?s <p> ?o } }",
            "--show", "5",
        ]
    )
    assert rc == 2
    err = capsys.readouterr().err.strip()
    assert "evaluable subset" in json.loads(err)["error"]


def test_ntriples_input(spark, tmpdir_path, capsys):
    nt = os.path.join(tmpdir_path, "g.nt")
    with open(nt, "w") as fh:
        fh.write(
            "<http://x/a> <http://x/knows> <http://x/b> .\n"
            "garbage\n"
            "<http://x/b> <http://x/knows> <http://x/c> .\n"
        )
    rc = query_graph.main(
        [
            "--triples", nt, "--triples-format", "ntriples",
            "--strip-base", "http://x/",
            "--query", "SELECT ?x ?z WHERE { ?x <knows>/<knows> ?z }",
            "--show", "5",
        ]
    )
    assert rc == 0
    out = capsys.readouterr()
    assert json.loads(out.out.strip().splitlines()[0]) == {"x": "a", "z": "c"}
    assert json.loads(out.err.strip().splitlines()[-1]) == {"warn_malformed_lines": 1}


def test_parse_reject_exit_code(triples_path, capsys):
    rc = query_graph.main(
        ["--triples", triples_path, "--query", "SELECT WHERE {", "--show", "1"]
    )
    assert rc == 2
