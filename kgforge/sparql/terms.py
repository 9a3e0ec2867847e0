"""RDF term and triple-pattern model.

Reference data model reconstructed in SURVEY.md section 1.1: a triple pattern
is a 3-tuple of terms, each term var / iri / literal (with optional datatype
and lang tag) / bnode ([R:bgp.py]).  We use lightweight tuples (not classes)
so the objects round-trip cheaply through pandas UDFs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

VAR = "var"
IRI = "iri"
LITERAL = "literal"
BNODE = "bnode"

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"


class Term(NamedTuple):
    kind: str  # var | iri | literal | bnode
    value: str  # var name without '?', IRI without <>, literal lexical form, bnode label
    dtype: Optional[str] = None  # datatype IRI for literals
    lang: Optional[str] = None  # language tag for literals


class TriplePattern(NamedTuple):
    s: Term
    p: Term
    o: Term


def render_term(t: Term, names: Optional[dict] = None) -> str:
    """Deterministic N-Triples-like rendering used for canonicalization,
    hashing, and the final (subj, pred, obj) string columns.

    ``names`` optionally maps original var names -> canonical names
    (without the leading '?').  Unmapped vars render as the wildcard '?'
    (used by the canonicalizer's masked sort key).
    """
    k = t.kind
    if k == VAR:
        if names is None:
            return "?" + t.value
        mapped = names.get(t.value)
        return "?" + mapped if mapped is not None else "?"
    if k == IRI:
        return "<" + t.value + ">"
    if k == BNODE:
        if names is None:
            return "_:" + t.value
        mapped = names.get("_:" + t.value)
        return "_:" + mapped if mapped is not None else "_:?"
    # literal
    esc = t.value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    out = '"' + esc + '"'
    if t.lang:
        out += "@" + t.lang
    elif t.dtype:
        out += "^^<" + t.dtype + ">"
    return out


def render_tp(tp: TriplePattern, names: Optional[dict] = None) -> str:
    return " ".join(
        (render_term(tp.s, names), render_term(tp.p, names), render_term(tp.o, names))
    )


def tp_to_plain(tp: TriplePattern) -> dict:
    """Struct-shaped dict for the Spark ``array<struct<s,p,o>>`` column."""

    def term_d(t: Term) -> dict:
        return {"kind": t.kind, "value": t.value, "dtype": t.dtype, "lang": t.lang}

    return {"s": term_d(tp.s), "p": term_d(tp.p), "o": term_d(tp.o)}
