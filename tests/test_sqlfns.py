"""U6/U7: SQL-registered function surface."""

import pytest

from kgforge.functions import register_all


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_all(spark)


def test_kg_bgp_hash_canonical_equivalence(spark):
    rows = spark.sql(
        """SELECT kg_bgp_hash('SELECT ?a WHERE { ?a <http://p> ?b }') AS h1,
                  kg_bgp_hash('SELECT ?x WHERE { ?x <http://p> ?y }') AS h2,
                  kg_bgp_hash('SELECT ?x WHERE { ?x <http://q> ?y }') AS h3,
                  kg_bgp_hash('not sparql at all') AS h4"""
    ).collect()[0]
    assert rows.h1 == rows.h2
    assert rows.h1 != rows.h3
    assert rows.h4 is None


def test_kg_parse_ok(spark):
    r = spark.sql(
        "SELECT kg_parse_ok('ASK { <http://a> <http://b> 1 }') AS a, kg_parse_ok('SELECT ?s WHERE {') AS b"
    ).collect()[0]
    assert r.a is True and r.b is False


def test_kg_detect_mentions_udtf(spark):
    spark.createDataFrame(
        [(1, 'x = """SELECT ?s WHERE { ?s ?p ?o }"""'), (2, "no queries here")],
        "id int, content string",
    ).createOrReplaceTempView("udtf_src")
    rows = spark.sql(
        """SELECT id, m.kind, m.raw FROM udtf_src,
           LATERAL kg_detect_mentions(content) AS m"""
    ).collect()
    assert len(rows) == 1
    assert rows[0].id == 1 and rows[0].kind == "sparql"
