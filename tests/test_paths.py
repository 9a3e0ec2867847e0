"""Property-path subset: sequence '/' and inverse '^' decompose to BGP TPs
with fresh intermediate variables; alternatives and quantifiers are counted
rejects (no BGP equivalent)."""

from kgforge.sparql import canonicalize_bgp, parse_query


def test_sequence_path_decomposes():
    r = parse_query("SELECT ?x WHERE { ?x <http://p>/<http://q> ?y }")
    assert r.parse_ok and len(r.tps) == 2 and not r.simple
    assert r.tps[0].o == r.tps[1].s  # chained through the fresh var


def test_inverse_path_swaps():
    r = parse_query("SELECT ?x WHERE { ?x ^<http://p> ?y }")
    assert r.parse_ok
    tp = r.tps[0]
    assert (tp.s.value, tp.o.value) == ("y", "x")


def test_inverse_of_sequence_canonical_equivalence():
    a = parse_query("SELECT ?x WHERE { ?x ^(<http://p>/<http://q>) ?y }").tps
    b = parse_query("SELECT ?x WHERE { ?y <http://p> ?m . ?m <http://q> ?x }").tps
    assert canonicalize_bgp(a) == canonicalize_bgp(b)


def test_a_keyword_in_path():
    r = parse_query("SELECT ?x WHERE { ?x a/<http://q> ?y }")
    assert r.parse_ok and len(r.tps) == 2
    assert r.tps[0].p.value.endswith("#type")


def test_path_with_object_list():
    r = parse_query("SELECT ?x WHERE { ?x <http://p>/<http://q> <http://A> , <http://B> }")
    assert r.parse_ok and len(r.tps) == 4
    # each object gets its OWN fresh intermediate variable
    assert r.tps[0].o != r.tps[2].o


def test_alternative_and_quantifiers_rejected():
    for q in (
        "SELECT ?x WHERE { ?x <http://p>|<http://q> ?y }",
        "SELECT ?x WHERE { ?x <http://p>+ ?y }",
        "SELECT ?x WHERE { ?x <http://p>* ?y }",
    ):
        r = parse_query(q)
        assert not r.parse_ok and "out of subset" in r.error
