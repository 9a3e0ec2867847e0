"""U1 mention detection unit tests."""

from urllib.parse import quote_plus

import pandas as pd

from kgforge.sparql.mentions import detect_mentions, detect_mentions_batch


Q = "PREFIX dbo: <http://dbpedia.org/ontology/> SELECT ?f WHERE { ?f dbo:birthPlace ?x } LIMIT 10"


def _log(q: str) -> str:
    return (
        f'127.0.0.5 - - [15/Aug/2026:10:00:07 +0200] "GET /sparql?query={quote_plus(q)}'
        f'&format=json HTTP/1.1" 200 1234 "-" "agent"'
    )


def test_docstring_block():
    content = f'def f():\n    """{Q}"""\n    pass\n'
    ms = detect_mentions(content)
    assert len(ms) == 1
    assert ms[0].kind == "sparql"
    assert ms[0].raw.startswith("PREFIX dbo:")
    assert content[ms[0].span_start : ms[0].span_end] == ms[0].raw


def test_log_line_decoded():
    ms = detect_mentions("noise\n" + _log(Q) + "\nnoise")
    assert len(ms) == 1
    assert ms[0].kind == "dbpedia_log"
    assert ms[0].raw == Q  # URL-decoding round-trips exactly


def test_multi_mention():
    content = f"# doc\n```sparql\n{Q}\n```\n" + _log("SELECT ?s WHERE { ?s ?p ?o }") + "\n// ASK { <http://a> <http://b> <http://c> }\n"
    ms = detect_mentions(content)
    assert [m.kind for m in ms] == ["sparql", "dbpedia_log", "sparql"]


def test_construct_extends_to_where_group():
    content = "// CONSTRUCT { ?a <http://k> ?b } WHERE { ?a <http://k> ?b . ?b <http://n> ?c }"
    ms = detect_mentions(content)
    assert len(ms) == 1
    assert ms[0].raw.count("{") == 2


def test_unbalanced_block_skipped():
    assert detect_mentions('x = """SELECT ?s WHERE { ?s') == []


def test_braces_inside_literals_ignored():
    content = 'SELECT ?s WHERE { ?s <http://p> "a { brace }" }'
    ms = detect_mentions(content)
    assert len(ms) == 1
    assert ms[0].raw == content


def test_no_mentions_in_plain_code():
    assert detect_mentions("def f():\n    return {'a': 1}\n") == []


def test_batch_prefilter_alignment():
    s = pd.Series(["noise", f"x\n{Q}\n", "more noise", _log(Q)])
    out = detect_mentions_batch(s)
    assert [len(v) for v in out] == [0, 1, 0, 1]
