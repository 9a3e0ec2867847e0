"""Crash-robustness fuzz: arbitrary content must never raise through the
mention-detect + parse + canonicalize chain (malformed input is a counted
reject, [R:Stat.py] skip-and-count semantics)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kgforge.operators.extract import _parse_one
from kgforge.sparql.mentions import detect_mentions

_fragments = st.sampled_from(
    [
        "SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "PREFIX p: <http://x/>",
        "WHERE", "{", "}", "?v", "<http://a/b>", '"lit"@en', "^^", "a", ";",
        ",", ".", "/sparql?query=SELECT%20", "OPTIONAL", "UNION", "FILTER(",
        ")", "|", "^", "/", "+", "*", "[", "]", "GET ", 'HTTP/1.1" 200 1 ',
        "[15/Aug/2026:10:00:00 +0200]", "\\", "\n", "  ", "🎉", "中文", "%ZZ",
        "'''", '"""', "_:b", "$x", "123", "1.5e10", "true",
        # round-2 grammar growth: alternatives, sub-selects, VALUES, collections
        "VALUES", "UNDEF", "(", "SELECT ?x WHERE {", "( 1 2 )",
        "<http://p>|<http://q>", "\\uZZZZ", '"\\u0041"',
    ]
)


@given(st.lists(_fragments, min_size=0, max_size=40).map("".join))
@settings(max_examples=400, deadline=None)
def test_detect_and_parse_never_raise(content):
    for m in detect_mentions(content):
        r = _parse_one(m.raw)
        assert isinstance(r[0], bool)
        assert 0 <= m.span_start <= m.span_end <= len(content)


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_arbitrary_unicode_never_raises(content):
    for m in detect_mentions(content):
        _parse_one(m.raw)


_iri = st.integers(min_value=0, max_value=6).map(lambda i: f"<http://p{i}>")


@given(st.lists(_iri, min_size=2, max_size=4, unique=True))
@settings(max_examples=60, deadline=None)
def test_path_alternative_always_equals_union_form(preds):
    """Property: '?s (p1|...|pk) ?o' canonicalizes identically to the
    equivalent UNION of single-TP groups, for any predicate set."""
    from kgforge.sparql import canonicalize_bgp, parse_query

    alt = parse_query("SELECT ?s WHERE { ?s " + "|".join(preds) + " ?o }")
    union_body = " UNION ".join("{ ?s " + p + " ?o }" for p in preds)
    uni = parse_query("SELECT ?s WHERE { " + union_body + " }")
    assert alt.parse_ok and uni.parse_ok
    assert canonicalize_bgp(alt.tps) == canonicalize_bgp(uni.tps)


@given(_iri, st.sampled_from(["+", "*", "?"]))
@settings(max_examples=30, deadline=None)
def test_path_quantifier_always_equals_bounded_union(pred, mod):
    """Property: '?s p+ ?o' (and p*) canonicalizes identically to the
    explicit UNION of depth-1..3 sequence chains, for any predicate; 'p?'
    (zero-or-one, round 4) to the depth-1 chain alone (its zero-length arm
    emits no TPs)."""
    from kgforge.sparql import canonicalize_bgp, parse_query

    quant = parse_query("SELECT ?s WHERE { ?s " + pred + mod + " ?o }")
    union_body = " UNION ".join(
        "{ ?s " + "/".join([pred] * d) + " ?o }"
        for d in ((1,) if mod == "?" else (1, 2, 3))
    )
    uni = parse_query("SELECT ?s WHERE { " + union_body + " }")
    assert quant.parse_ok and uni.parse_ok
    assert canonicalize_bgp(quant.tps) == canonicalize_bgp(uni.tps)


def test_parse_cache_bounded_on_high_distinct_corpus():
    """VERDICT r3 item 8: 500k DISTINCT query strings through the memoized
    parse path must keep the cache inside its byte budget (evicting LRU
    entries) instead of growing without bound — the old entry-count cap
    admitted multi-GiB of TP tuples per worker on high-cardinality corpora.
    Process RSS is asserted only loosely (interpreter noise), the cache's
    own accounting exactly."""
    import resource

    from kgforge.operators.extract import _PARSE_CACHE, _parse_one

    rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB on linux
    for i in range(500_000):
        _parse_one(
            f"SELECT ?s WHERE {{ ?s <http://example.org/pred/p{i}> ?o{i % 97} }}"
        )
    assert _PARSE_CACHE.bytes <= _PARSE_CACHE.max_bytes
    assert len(_PARSE_CACHE) < 500_000  # eviction actually happened
    assert _PARSE_CACHE.misses >= 500_000
    rss_after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # 64 MiB budget + slack for interpreter/allocator overhead << 2 GiB worker
    assert (rss_after - rss_before) < 1_000_000, f"RSS grew {rss_after - rss_before} KiB"


def test_parse_cache_hits_repeated_queries():
    from kgforge.operators.extract import _PARSE_CACHE, _parse_one

    q = "SELECT ?s WHERE { ?s <http://example.org/hot> ?o }"
    r1 = _parse_one(q)
    h0 = _PARSE_CACHE.hits
    r2 = _parse_one(q)
    assert r2 == r1 and _PARSE_CACHE.hits == h0 + 1
