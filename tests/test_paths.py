"""Property-path subset: sequence '/' and inverse '^' decompose to BGP TPs
with fresh intermediate variables; alternative '|' decomposes to one TP group
per branch (UNION-equivalent); quantifiers '+'/'*' expand to bounded-depth
sequence arms (depth 1..3), with [path_depth] counted rejects past the
alternative budget."""

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


def test_alternative_decomposes_like_union():
    r = parse_query("SELECT ?x WHERE { ?x <http://p>|<http://q> ?y }")
    assert r.parse_ok and len(r.tps) == 2 and not r.simple
    assert {tp.p.value for tp in r.tps} == {"http://p", "http://q"}
    u = parse_query(
        "SELECT ?x WHERE { { ?x <http://p> ?y } UNION { ?x <http://q> ?y } }"
    ).tps
    assert canonicalize_bgp(r.tps) == canonicalize_bgp(u)


def test_alternative_distributes_over_sequence():
    r = parse_query("SELECT ?x WHERE { ?x (<http://p>|<http://q>)/<http://r> ?y }")
    assert r.parse_ok and len(r.tps) == 4  # two 2-step chains


def test_alternative_blowup_is_rejected():
    # 2^4 = 16 > MAX_PATH_ALTS -> counted reject, not a combinatorial bomb
    path = "/".join("(<http://a>|<http://b>)" for _ in range(4))
    r = parse_query("SELECT ?x WHERE { ?x " + path + " ?y }")
    assert not r.parse_ok and "[path_alts]" in r.error


def test_quantifier_expands_bounded_depth():
    # p+ ~ p UNION p/p UNION p/p/p: 1+2+3 = 6 TPs; '*' expands identically
    # (its zero-length arm contributes no TPs under collect-all-arms)
    for q in (
        "SELECT ?x WHERE { ?x <http://p>+ ?y }",
        "SELECT ?x WHERE { ?x <http://p>* ?y }",
    ):
        r = parse_query(q)
        assert r.parse_ok and len(r.tps) == 6 and not r.simple
        assert all(tp.p.value == "http://p" for tp in r.tps)


def test_quantifier_expansion_equals_explicit_union():
    a = parse_query("SELECT ?x WHERE { ?x <http://p>+ ?y }").tps
    b = parse_query(
        "SELECT ?x WHERE { { ?x <http://p> ?y } UNION "
        "{ ?x <http://p>/<http://p> ?y } UNION "
        "{ ?x <http://p>/<http://p>/<http://p> ?y } }"
    ).tps
    assert canonicalize_bgp(a) == canonicalize_bgp(b)


def test_zero_or_one_expands_to_single_step():
    # p? = zero-length arm (no TPs) + single step: one TP, path sugar flag set
    r = parse_query("SELECT ?x WHERE { ?x <http://p>? ?y }")
    assert r.parse_ok and len(r.tps) == 1 and not r.simple
    tp = r.tps[0]
    assert (tp.s.value, tp.p.value, tp.o.value) == ("x", "http://p", "y")
    # canonical BGP collapses with the plain single-TP spelling
    plain = parse_query("SELECT ?x WHERE { ?x <http://p> ?y }").tps
    assert canonicalize_bgp(r.tps) == canonicalize_bgp(plain)


def test_zero_or_one_in_sequence():
    # p?/q -> arms: [q] (zero arm) and [p, q]: 1 + 2 = 3 TPs
    r = parse_query("SELECT ?x WHERE { ?x <http://p>?/<http://q> ?y }")
    assert r.parse_ok and len(r.tps) == 3
    preds = [tp.p.value for tp in r.tps]
    assert preds.count("http://q") == 2 and preds.count("http://p") == 1


def test_zero_or_one_of_group():
    # (p|q)? -> zero arm + one arm per branch
    r = parse_query("SELECT ?x WHERE { ?x (<http://p>|<http://q>)? ?y }")
    assert r.parse_ok and len(r.tps) == 2
    assert {tp.p.value for tp in r.tps} == {"http://p", "http://q"}


def test_zero_or_one_var_object_unaffected():
    # '?o' after the quantifier must still lex as a VAR, not two tokens
    r = parse_query("SELECT ?x WHERE { ?x <http://p>? ?o . ?o <http://q> ?z }")
    assert r.parse_ok and len(r.tps) == 2


def test_bare_question_mark_in_term_position_rejected():
    r = parse_query("SELECT ?x WHERE { ?x <http://p> ? }")
    assert not r.parse_ok


def test_negated_property_set_is_coded_reject():
    for q in (
        "SELECT ?x WHERE { ?x !<http://p> ?y }",
        "SELECT ?x WHERE { ?x !(<http://p>|^<http://q>) ?y }",
        "SELECT ?x WHERE { ?x <http://p>/!<http://q> ?y }",
    ):
        r = parse_query(q)
        assert not r.parse_ok and "[path_negated]" in r.error, q


def test_inverse_quantifier():
    # ^(p+) == (^p)+: every expanded TP runs object->subject
    r = parse_query("SELECT ?x WHERE { ?x ^<http://p>+ ?y }")
    assert r.parse_ok and len(r.tps) == 6
    depth1 = [tp for tp in r.tps if tp.s.value == "y" and tp.o.value == "x"]
    assert len(depth1) == 1


def test_quantified_group_over_budget_rejected():
    # (a|b)+ at depth 3: 2+4+8 = 14 arms > MAX_PATH_ALTS -> counted reject
    r = parse_query("SELECT ?x WHERE { ?x (<http://a>|<http://b>)+ ?y }")
    assert not r.parse_ok and "[path_depth]" in r.error
    # nested quantifier blows the budget the same way
    r2 = parse_query("SELECT ?x WHERE { ?x (<http://a>+)+ ?y }")
    assert not r2.parse_ok and "[path_depth]" in r2.error


def test_subquery_tps_collected():
    r = parse_query(
        "SELECT ?x WHERE { { SELECT ?x WHERE { ?x <http://p> ?pop } "
        "ORDER BY ?pop LIMIT 5 } ?x <http://q> ?c }"
    )
    assert r.parse_ok and len(r.tps) == 2 and not r.simple
    assert {tp.p.value for tp in r.tps} == {"http://p", "http://q"}


def test_collection_expands_to_first_rest_chain():
    r = parse_query("SELECT ?x WHERE { ?x <http://p> ( 1 2 ) }")
    assert r.parse_ok and len(r.tps) == 5
    preds = [tp.p.value.rsplit("#", 1)[-1] for tp in r.tps]
    assert preds.count("first") == 2 and preds.count("rest") == 2
    # chain terminates at rdf:nil
    assert any(tp.o.value.endswith("#nil") for tp in r.tps)
    # the enclosing TP's object is the chain head bnode
    head = [tp for tp in r.tps if tp.p.value == "http://p"][0]
    assert head.o.kind == "bnode"


def test_empty_collection_is_nil():
    r = parse_query("SELECT ?x WHERE { ?x <http://p> () }")
    assert r.parse_ok and len(r.tps) == 1
    assert r.tps[0].o.value.endswith("#nil")


def test_collection_as_subject():
    r = parse_query("SELECT ?x WHERE { ( ?a ?b ) <http://p> ?x }")
    assert r.parse_ok and len(r.tps) == 5


def test_values_parsed_and_validated():
    ok = parse_query(
        'SELECT ?x WHERE { ?x <http://p> ?c . VALUES ?c { <http://F> "s" 4 true } }'
    )
    assert ok.parse_ok and len(ok.tps) == 1 and not ok.simple
    multi = parse_query(
        "SELECT ?x WHERE { ?x <http://p> ?c . "
        "VALUES (?c ?d) { (<http://F> UNDEF) (1 2) } }"
    )
    assert multi.parse_ok and len(multi.tps) == 1
    bad_arity = parse_query("SELECT ?x WHERE { VALUES (?c ?d) { (<http://F>) } }")
    assert not bad_arity.parse_ok and "[values]" in bad_arity.error
    bad_term = parse_query("SELECT ?x WHERE { VALUES ?c { ?y } }")
    assert not bad_term.parse_ok and "[values]" in bad_term.error
