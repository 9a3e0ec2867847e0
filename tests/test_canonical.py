"""U3 canonicalization: golden pairs, property-based invariance (hypothesis),
and agreement with the independent brute-force oracle (tests/oracle.py)."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.corpus import POOL
from kgforge.sparql import bgp_hash, canonicalize_bgp, parse_query
from kgforge.sparql.terms import Term, TriplePattern
from tests.oracle import o_canonical


def test_variant_queries_same_hash():
    """FIXTURES.md item 7: same structure, different var names & TP order ->
    identical bgp_hash."""
    for q in POOL:
        base = bgp_hash(canonicalize_bgp(parse_query(q.text).tps))
        for v in q.variants:
            r = parse_query(v)
            assert r.parse_ok, (q.qid, r.error)
            assert bgp_hash(canonicalize_bgp(r.tps)) == base, q.qid


def test_near_miss_different_hash():
    """FIXTURES.md item 8: one term changed -> different hash."""
    a = parse_query("SELECT ?x WHERE { ?x <http://p> ?y . ?y <http://q> <http://r/A> }").tps
    b = parse_query("SELECT ?x WHERE { ?x <http://p> ?y . ?y <http://q> <http://r/B> }").tps
    c = parse_query("SELECT ?x WHERE { ?x <http://p> ?y . ?y <http://p> <http://r/A> }").tps
    hashes = {bgp_hash(canonicalize_bgp(t)) for t in (a, b, c)}
    assert len(hashes) == 3


def test_distinct_pool_structures_distinct_hashes():
    seen = {}
    for q in POOL:
        h = bgp_hash(canonicalize_bgp(q.tps))
        if h in seen:
            # by design: q10/q16 share {?s populationTotal ?pop}; q18's
            # path-alternative decomposes to exactly q09's UNION BGP
            assert {seen[h], q.qid} in ({"q10", "q16"}, {"q09", "q18"})
        seen[h] = q.qid


def test_engine_matches_independent_oracle_on_pool():
    for q in POOL:
        assert canonicalize_bgp(q.tps) == o_canonical(q.tps)[0], q.qid


# --- hypothesis property tests (SURVEY.md 5.2) --------------------------------

_iris = st.sampled_from([f"http://x/{c}" for c in "abcde"])
_vars = st.sampled_from([f"x{i}" for i in range(5)])


@st.composite
def _tp(draw):
    def term(pred=False):
        kind = draw(st.sampled_from(["var", "iri"] if pred else ["var", "iri", "lit"]))
        if kind == "var":
            return Term("var", draw(_vars))
        if kind == "iri":
            return Term("iri", draw(_iris))
        return Term("literal", draw(st.sampled_from(["1", "2", "three"])))

    return TriplePattern(term(), term(pred=True), term())


@st.composite
def _bgp(draw):
    return draw(st.lists(_tp(), min_size=1, max_size=5))


@given(_bgp(), st.randoms(use_true_random=False))
@settings(max_examples=200, deadline=None)
def test_invariance_under_renaming_and_permutation(tps, rnd):
    c = canonicalize_bgp(tps)
    pool = list({t.value for tp in tps for t in tp if t.kind == "var"})
    new_names = [f"z{i}" for i in range(len(pool))]
    rnd.shuffle(new_names)
    ren = dict(zip(pool, new_names))

    def rt(t):
        return Term("var", ren[t.value]) if t.kind == "var" else t

    tps2 = [TriplePattern(rt(a), rt(b), rt(cc)) for a, b, cc in tps]
    rnd.shuffle(tps2)
    assert canonicalize_bgp(tps2) == c


@given(_bgp())
@settings(max_examples=150, deadline=None)
def test_engine_matches_oracle_brute_force(tps):
    assert canonicalize_bgp(tps) == o_canonical(tps)[0]


def test_greedy_fallback_is_deterministic():
    """>7 vars takes the greedy path; it must at least be rename-invariant."""
    tps = [
        TriplePattern(Term("var", f"a{i}"), Term("iri", f"http://p/{i}"), Term("var", f"a{i+1}"))
        for i in range(9)
    ]
    c = canonicalize_bgp(tps)
    ren = {f"a{i}": f"q{9 - i}" for i in range(10)}
    tps2 = [
        TriplePattern(Term("var", ren[t.s.value]), t.p, Term("var", ren[t.o.value]))
        for t in tps
    ]
    random.Random(1).shuffle(tps2)
    assert canonicalize_bgp(tps2) == c
