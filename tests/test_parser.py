"""U2 parser unit tests: every pool query's hand-written TPs (FIXTURES.md
section 2) must match the parser's output exactly, in syntactic order."""

import pytest

from kgforge.corpus import POOL
from kgforge.sparql import parse_query
from kgforge.sparql.terms import Term, TriplePattern


@pytest.mark.parametrize("q", POOL, ids=[q.qid for q in POOL])
def test_pool_query_parses_to_hand_tps(q):
    r = parse_query(q.text)
    assert r.parse_ok, r.error
    assert r.query_form == q.form
    assert r.simple == q.simple
    assert r.tps == q.tps


@pytest.mark.parametrize(
    "q", [q for q in POOL if q.variants], ids=[q.qid for q in POOL if q.variants]
)
def test_variants_parse(q):
    for v in q.variants:
        r = parse_query(v)
        assert r.parse_ok, (v, r.error)
        assert len(r.tps) == len(q.tps)


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT ?s WHERE { ?s",  # truncated
        "SELECT WHERE { ?s ?p ?o }",  # empty projection
        "PREFIX dbo: SELECT ?x WHERE { ?x }",  # prefix without IRI
        "SELECT ?x WHERE { ?x undefined:prefix ?y }",  # undefined prefix
        "SELECT ?x WHERE { ?x <http://p> }",  # missing object
        "FOO ?x WHERE { ?x ?p ?o }",  # unknown form
        "SELECT ?x WHERE { ?x ?p ?o } trailing garbage {",  # trailing tokens
        "SELECT%ZZ?s WHERE {%Q",  # url-decode debris
    ],
)
def test_malformed_rejected_not_raised(bad):
    r = parse_query(bad)
    assert not r.parse_ok
    assert r.error
    assert r.tps == []


def test_prefix_expansion_and_a_keyword():
    r = parse_query(
        "PREFIX ex: <http://e.x/> SELECT ?s WHERE { ?s a ex:T ; ex:p 'lit'@fr }"
    )
    assert r.parse_ok
    assert r.tps[0].p.value == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert r.tps[0].o.value == "http://e.x/T"
    assert r.tps[1].o == Term("literal", "lit", lang="fr")


def test_numeric_and_boolean_sugar():
    r = parse_query("SELECT ?s WHERE { ?s <http://p> 42 . ?s <http://q> false }")
    assert r.parse_ok
    assert r.tps[0].o.dtype.endswith("integer")
    assert r.tps[0].o.value == "42"
    assert r.tps[1].o.dtype.endswith("boolean")


def test_filter_exists_contributes_tps():
    r = parse_query(
        "SELECT ?x WHERE { ?x <http://p> ?y . FILTER EXISTS { ?y <http://q> ?z } }"
    )
    assert r.parse_ok
    assert not r.simple
    assert len(r.tps) == 2


def test_nested_groups_and_union_collect_all():
    r = parse_query(
        "SELECT ?x WHERE { { ?x <http://p> 1 } UNION { ?x <http://q> 2 } . ?x <http://r> 3 }"
    )
    assert r.parse_ok
    assert len(r.tps) == 3


def test_construct_template_not_collected():
    r = parse_query(
        "CONSTRUCT { ?a <http://fake/made_up> ?b } WHERE { ?a <http://real/p> ?b }"
    )
    assert r.parse_ok
    assert len(r.tps) == 1
    assert r.tps[0].p.value == "http://real/p"


def test_blank_node_property_list():
    r = parse_query("SELECT ?n WHERE { [ <http://p> ?n ; <http://q> 5 ] }")
    assert r.parse_ok
    assert len(r.tps) == 2
    assert r.tps[0].s.kind == "bnode"
    assert r.tps[0].s == r.tps[1].s


def test_base_resolution():
    r = parse_query("BASE <http://base/> SELECT ?s WHERE { ?s <rel> <http://abs/x> }")
    assert r.parse_ok
    assert r.tps[0].p.value == "http://base/rel"
    assert r.tps[0].o.value == "http://abs/x"
