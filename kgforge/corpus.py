"""Deterministic synthetic corpus + entity dictionary (FIXTURES.md).

Generates the `source_files` input table (repo, path, commit, lang, content)
[B:15] with the FIXTURES.md section 1 content mix, the broadcast
`entity_dict` (section 3), and exposes the query pool with HAND-WRITTEN
expected triple patterns (section 2) — the pool metadata is what the
independent test oracle consumes, so expected triples never flow through the
parser under test.

Everything is seed-free *deterministic arithmetic* on the row index (no RNG,
no wall clock): the same (n_rows) always yields byte-identical content, so
P/R goldens are reproducible (FIXTURES.md preamble).

Content-mix slots by ``i % 20`` (FIXTURES.md section 1):
  0-6   plain code/noise (35%) — zero triples expected (precision guard)
  7-11  one embedded SPARQL block (25%)
  12-14 DBpedia log line (15%)
  15-16 multi-mention rows, 2-3 queries (10%)
  17-18 malformed (10%) — counted rejects, zero triples
  19    hot-predicate flood (5%) — rdf:type / dbo:wikiPageWikiLink skew
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, NamedTuple, Optional, Tuple
from urllib.parse import quote_plus

from kgforge.sparql.terms import Term, TriplePattern

DBO = "http://dbpedia.org/ontology/"
DBR = "http://dbpedia.org/resource/"
FOAF = "http://xmlns.com/foaf/0.1/"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS_C = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS_C + "type"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"


def V(n: str) -> Term:
    return Term("var", n)


def I(n: str) -> Term:  # noqa: E743
    return Term("iri", n)


def L(v: str, dtype: Optional[str] = None, lang: Optional[str] = None) -> Term:
    return Term("literal", v, dtype=dtype, lang=lang)


def B(n: str) -> Term:
    return Term("bnode", n)


def TP(s: Term, p: Term, o: Term) -> TriplePattern:
    return TriplePattern(s, p, o)


class PoolQuery(NamedTuple):
    qid: str
    text: str  # one-line SPARQL
    form: str
    simple: bool
    tps: List[TriplePattern]  # HAND-WRITTEN expected triple patterns
    variants: Tuple[str, ...] = ()  # same canonical BGP, different surface


POOL: List[PoolQuery] = [
    PoolQuery(
        "q01", "SELECT ?s WHERE { ?s ?p ?o }", "SELECT", True,
        [TP(V("s"), V("p"), V("o"))],
        ("SELECT ?a WHERE { ?a ?b ?c }",),
    ),
    PoolQuery(
        "q02",
        f"PREFIX dbo: <{DBO}> SELECT ?f WHERE {{ ?f dbo:birthPlace <{DBR}Nantes> }}",
        "SELECT", True,
        [TP(V("f"), I(DBO + "birthPlace"), I(DBR + "Nantes"))],
        (f"PREFIX o: <{DBO}> SELECT $who WHERE {{ $who o:birthPlace <{DBR}Nantes> }}",),
    ),
    PoolQuery(
        "q03",
        f"PREFIX dbo: <{DBO}> PREFIX dbr: <{DBR}> SELECT ?p WHERE "
        "{ ?p a dbo:Person ; dbo:birthPlace dbr:Nantes , dbr:Paris }",
        "SELECT", True,
        [
            TP(V("p"), I(RDF_TYPE), I(DBO + "Person")),
            TP(V("p"), I(DBO + "birthPlace"), I(DBR + "Nantes")),
            TP(V("p"), I(DBO + "birthPlace"), I(DBR + "Paris")),
        ],
    ),
    PoolQuery(
        "q04",
        f'PREFIX foaf: <{FOAF}> PREFIX xsd: <{XSD}> SELECT ?x WHERE '
        '{ ?x foaf:name "Jules Verne"@en . ?x foaf:age "42"^^xsd:integer . '
        '?x foaf:nick "JV" . ?x foaf:height 1.72 . ?x foaf:active true }',
        "SELECT", True,
        [
            TP(V("x"), I(FOAF + "name"), L("Jules Verne", lang="en")),
            TP(V("x"), I(FOAF + "age"), L("42", dtype=XSD + "integer")),
            TP(V("x"), I(FOAF + "nick"), L("JV")),
            TP(V("x"), I(FOAF + "height"), L("1.72", dtype=XSD + "decimal")),
            TP(V("x"), I(FOAF + "active"), L("true", dtype=XSD + "boolean")),
        ],
    ),
    PoolQuery(
        "q05",
        f"PREFIX dbo: <{DBO}> ASK {{ <{DBR}Nantes> dbo:country <{DBR}France> }}",
        "ASK", True,
        [TP(I(DBR + "Nantes"), I(DBO + "country"), I(DBR + "France"))],
    ),
    PoolQuery(
        "q06",
        f"PREFIX foaf: <{FOAF}> CONSTRUCT {{ ?a foaf:knows ?b }} WHERE "
        "{ ?a foaf:knows ?b . ?b foaf:name ?n }",
        "CONSTRUCT", True,
        [
            TP(V("a"), I(FOAF + "knows"), V("b")),
            TP(V("b"), I(FOAF + "name"), V("n")),
        ],
    ),
    PoolQuery(
        "q07",
        f"PREFIX dbo: <{DBO}> DESCRIBE ?c WHERE {{ ?c dbo:capital <{DBR}Paris> }}",
        "DESCRIBE", True,
        [TP(V("c"), I(DBO + "capital"), I(DBR + "Paris"))],
    ),
    PoolQuery(
        "q08",
        f"PREFIX dbo: <{DBO}> SELECT ?s ?l WHERE {{ ?s dbo:author <{DBR}Jules_Verne> "
        f"OPTIONAL {{ ?s <{RDFS_LABEL}> ?l }} }}",
        "SELECT", False,
        [
            TP(V("s"), I(DBO + "author"), I(DBR + "Jules_Verne")),
            TP(V("s"), I(RDFS_LABEL), V("l")),
        ],
    ),
    PoolQuery(
        "q09",
        f"PREFIX dbo: <{DBO}> SELECT ?x WHERE {{ {{ ?x dbo:birthPlace <{DBR}Nantes> }} "
        f"UNION {{ ?x dbo:deathPlace <{DBR}Nantes> }} }}",
        "SELECT", False,
        [
            TP(V("x"), I(DBO + "birthPlace"), I(DBR + "Nantes")),
            TP(V("x"), I(DBO + "deathPlace"), I(DBR + "Nantes")),
        ],
    ),
    PoolQuery(
        "q10",
        f"PREFIX dbo: <{DBO}> SELECT ?p ?pop WHERE "
        "{ ?p dbo:populationTotal ?pop . FILTER(?pop > 100000) }",
        "SELECT", False,
        [TP(V("p"), I(DBO + "populationTotal"), V("pop"))],
    ),
    PoolQuery(
        "q11",
        f"PREFIX dbo: <{DBO}> PREFIX dbr: <{DBR}> SELECT ?a WHERE "
        "{ ?a a dbo:Settlement . ?a a dbo:PopulatedPlace . "
        "?a dbo:wikiPageWikiLink dbr:France . ?a dbo:wikiPageWikiLink dbr:Europe . "
        "?a dbo:wikiPageWikiLink dbr:Paris }",
        "SELECT", True,
        [
            TP(V("a"), I(RDF_TYPE), I(DBO + "Settlement")),
            TP(V("a"), I(RDF_TYPE), I(DBO + "PopulatedPlace")),
            TP(V("a"), I(DBO + "wikiPageWikiLink"), I(DBR + "France")),
            TP(V("a"), I(DBO + "wikiPageWikiLink"), I(DBR + "Europe")),
            TP(V("a"), I(DBO + "wikiPageWikiLink"), I(DBR + "Paris")),
        ],
    ),
    PoolQuery(
        "q12",
        f"PREFIX dbo: <{DBO}> SELECT ?s WHERE {{ GRAPH <http://dbpedia.org> "
        f"{{ ?s dbo:region <{DBR}Brittany> }} }}",
        "SELECT", False,
        [TP(V("s"), I(DBO + "region"), I(DBR + "Brittany"))],
    ),
    PoolQuery(
        "q13",
        f"PREFIX foaf: <{FOAF}> SELECT ?n WHERE "
        f"{{ [ foaf:name ?n ; foaf:based_near <{DBR}Nantes> ] }}",
        "SELECT", True,
        [
            TP(B("b1"), I(FOAF + "name"), V("n")),
            TP(B("b1"), I(FOAF + "based_near"), I(DBR + "Nantes")),
        ],
    ),
    PoolQuery(
        "q14",
        f"PREFIX dbo: <{DBO}> SELECT ?x ?y WHERE {{ ?x a dbo:Person ; dbo:birthPlace ?y . "
        f"?y dbo:country <{DBR}France> }}",
        "SELECT", True,
        [
            TP(V("x"), I(RDF_TYPE), I(DBO + "Person")),
            TP(V("x"), I(DBO + "birthPlace"), V("y")),
            TP(V("y"), I(DBO + "country"), I(DBR + "France")),
        ],
        (
            f"PREFIX dbo: <{DBO}> SELECT ?m ?n WHERE {{ ?n dbo:country <{DBR}France> . "
            "?m dbo:birthPlace ?n . ?m a dbo:Person }",
        ),
    ),
    PoolQuery(
        "q15",
        f"PREFIX dbo: <{DBO}> SELECT ?x WHERE {{ ?x dbo:locatedIn <{DBR}Europe> "
        "MINUS { ?x a dbo:Country } }",
        "SELECT", False,
        [
            TP(V("x"), I(DBO + "locatedIn"), I(DBR + "Europe")),
            TP(V("x"), I(RDF_TYPE), I(DBO + "Country")),
        ],
    ),
    PoolQuery(
        "q17",
        f"PREFIX dbo: <{DBO}> SELECT ?x WHERE {{ ?x dbo:birthPlace/dbo:country ?c }}",
        "SELECT", False,  # path sugar -> simple=False
        [
            TP(V("x"), I(DBO + "birthPlace"), V("_path1")),
            TP(V("_path1"), I(DBO + "country"), V("c")),
        ],
        (f"PREFIX dbo: <{DBO}> SELECT ?a WHERE {{ ?a dbo:birthPlace ?m . ?m dbo:country ?b }}",),
    ),
    PoolQuery(
        "q16",
        f"PREFIX dbo: <{DBO}> SELECT DISTINCT ?s WHERE "
        "{ ?s dbo:populationTotal ?pop } ORDER BY DESC(?pop) LIMIT 10",
        "SELECT", True,
        [TP(V("s"), I(DBO + "populationTotal"), V("pop"))],
    ),
    PoolQuery(
        # property-path alternative: decomposes to one TP per branch — the
        # UNION-equivalent, so its canonical BGP collapses with the UNION form
        "q18",
        f"PREFIX dbo: <{DBO}> SELECT ?x WHERE "
        f"{{ ?x dbo:birthPlace|dbo:deathPlace <{DBR}Nantes> }}",
        "SELECT", False,
        [
            TP(V("x"), I(DBO + "birthPlace"), I(DBR + "Nantes")),
            TP(V("x"), I(DBO + "deathPlace"), I(DBR + "Nantes")),
        ],
        (
            f"PREFIX dbo: <{DBO}> SELECT ?w WHERE {{ {{ ?w dbo:birthPlace <{DBR}Nantes> }} "
            f"UNION {{ ?w dbo:deathPlace <{DBR}Nantes> }} }}",
        ),
    ),
    PoolQuery(
        # subquery: TPs inside the sub-SELECT's WHERE are collected too
        "q19",
        f"PREFIX dbo: <{DBO}> SELECT ?x WHERE "
        "{ { SELECT ?x WHERE { ?x dbo:populationTotal ?pop } ORDER BY DESC(?pop) LIMIT 5 } "
        f"?x dbo:capital <{DBR}Paris> }}",
        "SELECT", False,
        [
            TP(V("x"), I(DBO + "populationTotal"), V("pop")),
            TP(V("x"), I(DBO + "capital"), I(DBR + "Paris")),
        ],
    ),
    PoolQuery(
        # RDF collection: expands to the rdf:first/rdf:rest bnode chain
        "q21",
        f"PREFIX dbo: <{DBO}> PREFIX dbr: <{DBR}> SELECT ?x WHERE "
        "{ ?x dbo:wikiPageWikiLink ( dbr:France dbr:Spain ) }",
        "SELECT", True,
        [
            TP(B("b1"), I(RDF_NS_C + "first"), I(DBR + "France")),
            TP(B("b1"), I(RDF_NS_C + "rest"), B("b2")),
            TP(B("b2"), I(RDF_NS_C + "first"), I(DBR + "Spain")),
            TP(B("b2"), I(RDF_NS_C + "rest"), I(RDF_NS_C + "nil")),
            TP(V("x"), I(DBO + "wikiPageWikiLink"), B("b1")),
        ],
    ),
    PoolQuery(
        # quantified property path: 'p+' expands to depth-1..3 sequence arms
        # (the bounded-UNION treatment, VERDICT r2 item 4); the variant is
        # the explicit UNION spelling and must collapse to the same
        # canonical BGP
        "q22",
        f"PREFIX dbo: <{DBO}> SELECT ?x WHERE {{ ?x dbo:wikiPageRedirects+ ?y }}",
        "SELECT", False,
        [
            TP(V("x"), I(DBO + "wikiPageRedirects"), V("y")),
            TP(V("x"), I(DBO + "wikiPageRedirects"), V("_path1")),
            TP(V("_path1"), I(DBO + "wikiPageRedirects"), V("y")),
            TP(V("x"), I(DBO + "wikiPageRedirects"), V("_path2")),
            TP(V("_path2"), I(DBO + "wikiPageRedirects"), V("_path3")),
            TP(V("_path3"), I(DBO + "wikiPageRedirects"), V("y")),
        ],
        (
            f"PREFIX dbo: <{DBO}> SELECT ?a WHERE "
            "{ { ?a dbo:wikiPageRedirects ?b } UNION "
            "{ ?a dbo:wikiPageRedirects/dbo:wikiPageRedirects ?b } UNION "
            "{ ?a dbo:wikiPageRedirects/dbo:wikiPageRedirects/dbo:wikiPageRedirects ?b } }",
            # '*' expands to the same TP arms (zero-length arm emits none)
            f"PREFIX dbo: <{DBO}> SELECT ?a WHERE {{ ?a dbo:wikiPageRedirects* ?b }}",
        ),
    ),
    PoolQuery(
        # quantifier ending at a constant: arms still chain through fresh
        # vars, last step lands on the IRI
        "q23",
        f"PREFIX dbo: <{DBO}> SELECT ?x WHERE "
        f"{{ ?x dbo:subdivision+ <{DBR}France> }}",
        "SELECT", False,
        [
            TP(V("x"), I(DBO + "subdivision"), I(DBR + "France")),
            TP(V("x"), I(DBO + "subdivision"), V("_path1")),
            TP(V("_path1"), I(DBO + "subdivision"), I(DBR + "France")),
            TP(V("x"), I(DBO + "subdivision"), V("_path2")),
            TP(V("_path2"), I(DBO + "subdivision"), V("_path3")),
            TP(V("_path3"), I(DBO + "subdivision"), I(DBR + "France")),
        ],
    ),
    PoolQuery(
        # zero-or-one property path (round 4): '?' expands to a zero-length
        # arm (emits no TPs under collect-all-arms) plus the single step, so
        # the canonical BGP collapses with the plain spelling (the variant)
        "q24",
        f"PREFIX dbo: <{DBO}> SELECT ?x ?y WHERE {{ ?x dbo:capital? ?y }}",
        "SELECT", False,
        [TP(V("x"), I(DBO + "capital"), V("y"))],
        (f"PREFIX dbo: <{DBO}> SELECT ?a ?b WHERE {{ ?a dbo:capital ?b }}",),
    ),
    PoolQuery(
        # VALUES inline data: parsed + validated, binds solutions, adds no TPs
        "q20",
        f"PREFIX dbo: <{DBO}> SELECT ?x WHERE "
        f"{{ ?x dbo:country ?c . VALUES ?c {{ <{DBR}France> <{DBR}Spain> }} }}",
        "SELECT", False,
        [TP(V("x"), I(DBO + "country"), V("c"))],
        (
            f"PREFIX dbo: <{DBO}> SELECT ?y WHERE {{ ?y dbo:country ?k . "
            f"VALUES (?k) {{ (<{DBR}France>) (UNDEF) }} }}",
        ),
    ),
]

POOL_BY_ID: Dict[str, PoolQuery] = {q.qid: q for q in POOL}

# Queries planted in log lines (must be URL-encodable one-liners; all are).
LOG_POOL_IDS = ["q01", "q02", "q05", "q10", "q14", "q16"]


# ---------------------------------------------------------------------------
# entity_dict (FIXTURES.md section 3): surface -> candidates with priors and
# entity types; ambiguous surfaces exercise the scored ranking (U4/W1).
# ---------------------------------------------------------------------------

# (surface, entity_id, prior, etype)
_AMBIGUOUS: List[Tuple[str, str, float, str]] = [
    ("paris", "dbr:E_paris_place", 0.70, "place"),
    ("paris", "dbr:E_paris_person", 0.90, "person"),
    ("paris", "dbr:E_paris_band", 0.40, "org"),
    ("france", "dbr:E_france_place", 0.80, "place"),
    ("france", "dbr:E_france_person", 0.50, "person"),
    ("nantes", "dbr:E_nantes_place", 0.85, "place"),
    ("nantes", "dbr:E_nantes_club", 0.60, "org"),
]
_SIMPLE_SURFACES = [
    ("europe", "place"), ("brittany", "place"), ("jules_verne", "person"),
    ("jules verne", "person"), ("jv", "person"),
]

# predicate local name (lowercased) -> entity type it selects for
PRED_ETYPE: Dict[str, str] = {
    "birthplace": "place", "deathplace": "place", "country": "place",
    "capital": "place", "locatedin": "place", "region": "place",
    "based_near": "place", "wikipagewikilink": "place",
    "author": "person", "knows": "person", "name": "person",
}


def entity_dict_rows() -> List[Tuple[str, str, float, str]]:
    rows = list(_AMBIGUOUS)
    for s, et in _SIMPLE_SURFACES:
        rows.append((s, f"dbr:E_{s.replace(' ', '_')}", 0.75, et))
    # ~490 deterministic decoys, a few ambiguous
    for i in range(490):
        rows.append((f"decoy{i}", f"dbr:E_decoy{i}", 0.1 + (i % 9) / 10.0, "thing"))
        if i % 97 == 0:
            rows.append((f"decoy{i}", f"dbr:E_decoy{i}_alt", 0.05, "org"))
    return rows


# ---------------------------------------------------------------------------
# corpus generation
# ---------------------------------------------------------------------------

# bump when generate_rows output changes: benchmark corpus caches key on it
CORPUS_VERSION = 4  # round 4: q24 zero-or-one path query joins the pool

LANG_EXT = {"py": "py", "java": "java", "md": "md", "sparql": "rq", "txt": "txt", "log": "log"}

_NOISE_TEMPLATES = [
    "def process_{i}(x):\n    return x * {i} + 1\n\n# no queries here, just math\n",
    "public class Worker{i} {{\n  int run() {{ return {i}; }}\n}}\n",
    "# Notes {i}\n\nWe select the best option from the menu {{ not a query }}.\n",
    "TODO({i}): refactor the construct of this module where possible\n",
    "log rotation config {i}: keep=7 compress=true\n",
    "x{i} = [k for k in range(10)]\nprint(sum(x{i}))\n",
    "SELECT-ish prose: we describe the approach, asking nothing.\n",
]

_MALFORMED_TEMPLATES = [
    # truncated SPARQL: detector finds no balanced group -> skip
    'def broken_{i}():\n    """SELECT ?s WHERE {{ ?s"""\n    pass\n',
    # bad URL-encoding in a log line -> parser reject
    '10.0.0.{k} - - [15/Aug/2026:11:22:{s2} +0200] "GET /sparql?query=SELECT%ZZ%3Fs%20WHERE%20%7B%Q HTTP/1.1" 400 0 "-" "bot"\n',
    # base64-ish junk with a stray keyword
    "UEsDBBQAAAAIA{i}kZ2FyYmFnZQ== SELECT kq8/3 {{]}} not parseable\n",
]


def _carrier(kind: int, qtext: str, i: int) -> Tuple[str, str]:
    """Wrap a one-line query in a realistic carrier; returns (lang, content)."""
    if kind == 0:
        return "py", f'def fetch_{i}():\n    """Issue the endpoint query:\n    {qtext}\n    and decode the bindings."""\n    return None\n'
    if kind == 1:
        return "java", f"// {qtext}\npublic class Q{i} {{ }}\n"
    return "md", f"# Example {i}\n\n```sparql\n{qtext}\n```\n"


def _log_line(qtext: str, i: int) -> str:
    k, s = i % 250, i % 60
    return (
        f'127.0.0.{k} - - [15/Aug/2026:10:{(i // 60) % 60:02d}:{s:02d} +0200] '
        f'"GET /sparql?query={quote_plus(qtext)}&format=json HTTP/1.1" 200 {1000 + i % 4000} "-" "agent/1.{i % 9}"\n'
    )


class Plant(NamedTuple):
    row: int
    qid: str
    kind: str  # sparql | dbpedia_log


def _pool_pick(j: int) -> PoolQuery:
    # stride 1 is coprime with EVERY pool size: all entries get planted
    # (a fixed stride of 7 silently collapsed coverage to gcd(7, len) entries
    # when the pool grew to 21 — caught by n_distinct_bgps dropping)
    return POOL[(j + 3) % len(POOL)]


def generate_rows(n_rows: int, start: int = 0) -> Tuple[List[dict], List[Plant]]:
    """Returns (source_files rows, plants) for row ids [start, start+n_rows).
    Pure deterministic arithmetic — chunked generation (start > 0) produces
    byte-identical rows to one-shot generation."""
    rows: List[dict] = []
    plants: List[Plant] = []
    for i in range(start, start + n_rows):
        slot = i % 20
        if slot <= 6:  # noise
            lang = "txt" if slot % 2 else "py"
            content = _NOISE_TEMPLATES[(i // 20 + slot) % len(_NOISE_TEMPLATES)].format(i=i)
        elif slot <= 11:  # one SPARQL block
            q = _pool_pick(i)
            text = q.text if (i // 20) % 3 == 0 or not q.variants else q.variants[(i // 20) % len(q.variants) if len(q.variants) > 1 else 0]
            lang, content = _carrier(i % 3, text, i)
            plants.append(Plant(i, q.qid, "sparql"))
        elif slot <= 14:  # log line
            q = POOL_BY_ID[LOG_POOL_IDS[(i // 20 + slot) % len(LOG_POOL_IDS)]]
            lang = "log"
            content = f"boot ok {i}\n" + _log_line(q.text, i) + f"shutdown {i}\n"
            plants.append(Plant(i, q.qid, "dbpedia_log"))
        elif slot <= 16:  # multi-mention: 2-3 queries in one content
            n_q = 2 + (i % 2)
            parts = [f"# multi {i}\n"]
            for j in range(n_q):
                q = _pool_pick(i + j + 11)
                if j == 1:
                    parts.append(_log_line(q.text, i + j))
                    plants.append(Plant(i, q.qid, "dbpedia_log"))
                else:
                    parts.append(_carrier((i + j) % 3, q.text, i + j)[1])
                    plants.append(Plant(i, q.qid, "sparql"))
            lang, content = "md", "\n".join(parts)
        elif slot <= 18:  # malformed
            t = _MALFORMED_TEMPLATES[(i // 20 + slot) % len(_MALFORMED_TEMPLATES)]
            lang = "log" if "GET /sparql" in t else "txt"
            content = t.format(i=i, k=i % 250, s2=i % 60)
        else:  # hot-predicate flood
            q = POOL_BY_ID["q11" if (i // 20) % 2 == 0 else "q03"]
            lang, content = _carrier(i % 3, q.text, i)
            plants.append(Plant(i, q.qid, "sparql"))
        ext = LANG_EXT[lang]
        rows.append(
            {
                "repo": f"org{i % 50}/repo{i % 500}",
                "path": f"src/module{i % 100}/file{i}.{ext}",
                "commit": hashlib.sha1(f"commit{i}".encode()).hexdigest(),
                "lang": lang,
                "content": content,
            }
        )
    return rows, plants


def content_sha256(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


def write_corpus_parquet(path: str, n_rows: int, n_files: int = 64) -> None:
    """Materialize a corpus as a MULTI-FILE parquet dataset directory.

    Real source tables are many files; a single file caps the scan at one
    input split regardless of cluster size (observed: local[32] slower than
    local[8] on a 1-file corpus), so the generator writes ~n_files files."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    per = max(1, n_rows // n_files)
    for f in range(0, n_rows, per):
        chunk, _ = generate_rows(min(per, n_rows - f), start=f)  # chunked: O(per) memory
        pq.write_table(
            pa.Table.from_pylist(chunk),
            os.path.join(path, f"part-{f // per:05d}.parquet"),
            row_group_size=max(500, len(chunk) // 4),
        )
