"""Pure-Python SPARQL-subset frontend (no Spark imports).

These modules run INSIDE pandas/Arrow UDFs on executors, so they must be
importable without a SparkSession and be cheap to pickle (module-level
functions only, precompiled regexes).

Semantics reconstructed from the reference ([R:QueryManager.py], [R:bgp.py],
SURVEY.md section 2.9); rdflib is not available in this sandbox and porting
is out of scope, so the grammar subset is defined here (SURVEY.md U2).
"""

from kgforge.sparql.terms import Term, TriplePattern, render_term, render_tp
from kgforge.sparql.parser import parse_query, ParseResult
from kgforge.sparql.canonical import canonicalize_bgp, bgp_hash

__all__ = [
    "Term",
    "TriplePattern",
    "render_term",
    "render_tp",
    "parse_query",
    "ParseResult",
    "canonicalize_bgp",
    "bgp_hash",
]
