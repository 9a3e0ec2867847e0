"""From-scratch SPARQL-subset parser -> triple patterns.

The reference delegated parsing to rdflib (parseQuery -> translateQuery ->
walk the algebra collecting BGP nodes, [R:QueryManager.py, SURVEY.md 2.9 U2]).
rdflib is absent in this sandbox and porting is out of scope, so this module
implements the grammar subset fixed in SURVEY.md U2:

  prologue (PREFIX/BASE) + SELECT/ASK/CONSTRUCT/DESCRIBE
  + WHERE { TriplesBlock ( '.' TriplesBlock )* } with nested groups,
  OPTIONAL / UNION / GRAPH / MINUS / FILTER / BIND recognized;
  sub-SELECT groups parsed (their WHERE TPs are collected);
  VALUES inline data parsed and validated (binds solutions, adds no TPs);
  property paths: sequence '/', inverse '^' (fresh-var decomposition),
  alternative '|' (one TP group per branch, the UNION-equivalent),
  quantifiers '+'/'*' as bounded-depth expansions (sequences of length
  1..MAX_PATH_DEPTH, one TP group per depth — the zero-length arm of '*'
  emits no TPs so both expand identically under collect-all-arms
  semantics), and zero-or-one '?' as the two-arm expansion (zero-length
  arm + single pass, round 4); expansions past the alternative budget are
  counted rejects with code [path_depth];
  triple patterns are collected from ALL basic graph pattern groups
  (the reference keeps the BGP content of the whole WHERE clause);
  'a' keyword -> rdf:type; ';' predicate-object lists and ',' object lists;
  literals with @lang / ^^dtype and numeric/boolean sugar; blank nodes;
  RDF collections '( e1 e2 )' expand to the rdf:first/rdf:rest bnode chain.

Anything outside the subset is a counted reject (parse_ok=False), mirroring
the reference's skip-and-count behavior ([R:Stat.py], SURVEY.md 1.1).

Pure Python, no Spark imports: executed inside pandas UDFs (SURVEY.md 2.9,
"U2+U3 execute in ONE pandas UDF").
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Optional, Tuple

from kgforge.sparql.terms import BNODE, IRI, LITERAL, RDF_NS, RDF_TYPE, VAR, Term, TriplePattern

XSD = "http://www.w3.org/2001/XMLSchema#"

# Token kinds, longest-match-first.  PN_LOCAL intentionally simplified vs the
# full SPARQL 1.1 grammar (no percent-encoding / char escapes in local names);
# out-of-subset names fail tokenization and become counted rejects.
_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<STRING3>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<STRING>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<VAR>[?$][A-Za-z_][A-Za-z_0-9]*)
  | (?P<LANG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DTYPE_SEP>\^\^)
  | (?P<NUMBER>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<BNODE>_:[A-Za-z_][A-Za-z_0-9.-]*)
  | (?P<PNAME>[A-Za-z_][A-Za-z_0-9.-]*?:[A-Za-z_0-9](?:[A-Za-z_0-9.-]*[A-Za-z_0-9])?|[A-Za-z_][A-Za-z_0-9.-]*:)
  | (?P<KEYWORD>[A-Za-z][A-Za-z_0-9]*)
  | (?P<PUNCT>[{}().;,*\[\]]|\|\||&&|[!<>=]=?|[+\-/|^?])
    """,
    re.VERBOSE,
)

_NUM_INT = re.compile(r"^[+-]?\d+$")
_NUM_DEC = re.compile(r"^[+-]?(?:\d+\.\d*|\.\d+)$")

_KEYWORDS = {
    "SELECT", "ASK", "CONSTRUCT", "DESCRIBE", "WHERE", "PREFIX", "BASE",
    "OPTIONAL", "UNION", "FILTER", "GRAPH", "MINUS", "BIND", "VALUES",
    "SERVICE", "DISTINCT", "REDUCED", "AS", "A", "TRUE", "FALSE",
    "ORDER", "BY", "LIMIT", "OFFSET", "GROUP", "HAVING", "ASC", "DESC",
    "FROM", "NAMED", "EXISTS", "NOT", "IN", "REGEX", "STR", "LANG",
    "LANGMATCHES", "DATATYPE", "BOUND", "SAMETERM", "ISIRI", "ISURI",
    "ISBLANK", "ISLITERAL", "COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE",
    "GROUP_CONCAT", "REPLACE", "CONTAINS", "STRSTARTS", "STRENDS", "ABS",
    "CEIL", "FLOOR", "ROUND", "CONCAT", "STRLEN", "UCASE", "LCASE",
}

# Features that make a query "not a simple BGP" (reference flags these and
# still extracts TPs from every group; SURVEY.md 2.9 U2, FIXTURES.md item 6).
_COMPLEX = {"OPTIONAL", "UNION", "FILTER", "GRAPH", "MINUS", "BIND", "VALUES", "SERVICE"}


class Token(NamedTuple):
    kind: str
    text: str
    pos: int


class ParseError(Exception):
    pass


def tokenize(text: str) -> List[Token]:
    out: List[Token] = []
    i, n = 0, len(text)
    while i < n:
        m = _TOKEN_RE.match(text, i)
        if m is None:
            raise ParseError(f"lex error at offset {i}: {text[i:i+20]!r}")
        kind = m.lastgroup or ""
        if kind != "WS":
            # Unknown bare words tokenize as KEYWORD; the parser rejects them
            # wherever a term is required (permissive inside skipped FILTER
            # expressions, strict in triple positions).
            out.append(Token(kind, m.group(), i))
        i = m.end()
    return out


class ParseResult(NamedTuple):
    parse_ok: bool
    query_form: Optional[str]  # SELECT | ASK | CONSTRUCT | DESCRIBE
    tps: List[TriplePattern]
    simple: bool  # False when OPTIONAL/UNION/FILTER/... present
    error: Optional[str]
    # Round-6 evaluation fields (defaulted — every pre-existing constructor
    # and positional consumer keeps working; extract.py reads attributes only):
    #   select_vars: projected var names of the TOP-LEVEL SELECT clause, in
    #     query order, None for 'SELECT *' / ASK / CONSTRUCT / DESCRIBE;
    #   distinct: top-level SELECT DISTINCT;
    #   evaluable: the flat ``tps`` list IS the query's full semantics as a
    #     conjunctive BGP — SELECT/ASK form, no OPTIONAL/UNION/FILTER/...,
    #     no multi-arm path expansion ('|', '+', '*', '?' produce one TP
    #     group PER ARM whose flat conjunction is wrong to evaluate; plain
    #     sequence '/' and inverse '^' decompositions remain conjunctive
    #     and therefore evaluable).  The BGP evaluator (sparql/eval.py)
    #     keys off this instead of the coarser ``simple`` flag.
    select_vars: Optional[List[str]] = None
    distinct: bool = False
    evaluable: bool = False
    # CONSTRUCT template TPs (None for other forms and for the
    # 'CONSTRUCT WHERE { ... }' shorthand, whose template is ``tps``)
    template: Optional[List[TriplePattern]] = None
    # evaluable-subset FILTER constraint ASTs (comparisons, &&/||/!,
    # REGEX/CONTAINS/STRSTARTS/STRENDS — picklable tuples compiled to
    # Columns by sparql/eval.py; out-of-subset filters instead set
    # evaluable=False via the complex flag)
    filters: Tuple[tuple, ...] = ()
    # top-level OPTIONAL groups as (tps_tuple, filters_tuple) pairs, in
    # query order.  ``tps`` above still INCLUDES these TPs (flat
    # collect-all-groups, the stats contract); ``base_tps`` below is the
    # conjunctive base with the optional spans removed — what the
    # evaluator joins before LeftJoining each optional group.
    optionals: Tuple[tuple, ...] = ()
    base_tps: Optional[List[TriplePattern]] = None
    # ONE top-level UNION chain as ((tps, filters), ...) arms; evaluable
    # only when the chain is the ENTIRE WHERE group (mixing base TPs with
    # a union needs compatibility joins over NULL-padded arms — out of
    # the subset, demoted instead of approximated)
    unions: Tuple[tuple, ...] = ()
    # ONE top-level UNDEF-free VALUES clause as (vars, rows): an inline
    # solution table the evaluator equi-joins with the solution frame
    # (UNDEF rows need compatibility joins — demoted instead)
    values: Optional[tuple] = None
    # DESCRIBE targets (IRI and/or VAR Terms; '*' expands to every WHERE
    # var at evaluation time)
    describe_terms: Tuple[Term, ...] = ()
    describe_star: bool = False
    # top-level MINUS groups as (tps, filters) pairs — evaluated as LEFT
    # ANTI joins on the shared vars (exact for always-bound BGP solutions)
    minuses: Tuple[tuple, ...] = ()
    # solution modifiers (SELECT only — other forms demote when present):
    # ORDER BY (var, descending) specs, integer LIMIT/OFFSET, GROUP BY
    # vars, and projection aggregates (func, var|None='*', distinct,
    # alias); select_vars lists agg aliases in projection order.
    order_by: Tuple[tuple, ...] = ()
    limit: Optional[int] = None
    offset: Optional[int] = None
    group_by: Tuple[str, ...] = ()
    aggregates: Tuple[tuple, ...] = ()
    # EXACT transitive closure route: set when the WHERE is exactly ONE
    # quantified single-predicate path TP — (subject Term, pred Term,
    # inverse, '+'|'*', object Term).  The evaluator answers it with
    # graph.path_closure (iterative doubling) instead of the parser's
    # bounded-depth arm expansion, which only exists for the stats
    # contract and is never evaluated.
    closure: Optional[tuple] = None
    # evaluable BIND clauses (value-expr AST, fresh var), applied as
    # withColumn after the join frame is built
    binds: Tuple[tuple, ...] = ()
    # top-level FILTER [NOT] EXISTS groups as (negated, tps, filters):
    # semi/anti joins on the shared vars (pattern vars stay local, the
    # spec's non-binding EXISTS scope); no-shared-vars patterns act as
    # global existence gates
    exists: Tuple[tuple, ...] = ()
    # path-alternative route: (subject Term, arms, object Term) when the
    # WHERE is exactly one quantifier-free 'p|q'-style path — evaluated
    # as the UNION of the arm chains (each arm a tuple of (inverse, Term)
    # steps)
    path_alt: Optional[tuple] = None


class _Parser:
    def __init__(self, tokens: List[Token]):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict = {}
        self.base: Optional[str] = None
        self.tps: List[TriplePattern] = []
        self.simple = True
        self._bnode_n = 0
        self._path_n = 0
        # evaluability tracking (round 6): `complex` = a feature whose
        # semantics the flat TP list does not carry (OPTIONAL/UNION/FILTER/
        # MINUS/GRAPH/BIND/VALUES/SERVICE/sub-SELECT/projection exprs);
        # `multi_arm` = a property-path expansion emitted >1 TP group.
        self.complex = False
        self.multi_arm = False
        self.select_vars: Optional[List[str]] = None
        self.select_distinct = False
        # CONSTRUCT template TPs ('CONSTRUCT WHERE { ... }' shorthand
        # leaves this None: the template IS the WHERE pattern)
        self.template: Optional[List[TriplePattern]] = None
        # evaluable-subset FILTER ASTs (validated against their group's
        # variable scope at group exit; out-of-scope or out-of-subset
        # filters set complex=True instead)
        self.filters: List[tuple] = []
        # top-level OPTIONAL groups captured for evaluation as
        # (tp_start, tp_end, filters) spans over self.tps — the flat tps
        # list keeps INCLUDING optional TPs (the reference collected TPs
        # from every group; stats/canonicalization depend on that), the
        # spans let the evaluator split base vs optional.
        self.optional_spans: List[tuple] = []
        # ONE top-level UNION chain captured for evaluation, as arm spans
        # (tp_start, tp_end, filters) — same flat-tps contract as optionals
        self.union_arms: List[tuple] = []
        # ONE top-level UNDEF-free VALUES clause: (vars, rows) or None
        self.values_clause: Optional[tuple] = None
        # DESCRIBE targets: explicit IRIs and/or vars ('*' = every var)
        self.describe_terms: List[Term] = []
        self.describe_star = False
        # top-level MINUS groups, same span shape as optional_spans
        self.minus_spans: List[tuple] = []
        # exact-closure capture: (subject, pred, inverse, '+'|'*', object)
        # per quantified single-predicate path occurrence
        self._quant_path = None
        self.closure_specs: List[tuple] = []
        # exact-alternative capture: (subject, arms, object) where arms is
        # a tuple of non-empty (inverse, Term) step tuples — a 'p|q' (or
        # 'a/b|c') path is EXACTLY the union of its arm chains; recorded
        # only for quantifier-free multi-arm paths
        self.alt_specs: List[tuple] = []
        # evaluable BIND clauses: (value-expr AST, fresh var name)
        self.binds: List[tuple] = []
        # top-level FILTER [NOT] EXISTS groups: (negated, tp_start,
        # tp_end, filters) spans — semi/anti joins at evaluation
        self.exists_spans: List[tuple] = []
        # solution modifiers (top-level form only): ORDER BY specs as
        # (var, descending) pairs, LIMIT/OFFSET ints, GROUP BY vars, and
        # projection aggregates as (func, var|None for '*', distinct,
        # alias) — out-of-subset forms (expressions, HAVING) set complex.
        self.order_by: List[tuple] = []
        self.limit: Optional[int] = None
        self.offset: Optional[int] = None
        self.group_by: List[str] = []
        self.aggregates: List[tuple] = []
        self._depth = 0

    # --- token helpers -------------------------------------------------
    def peek(self) -> Optional[Token]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of query")
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "KEYWORD" and t.text.upper() in kws

    def eat_kw(self, kw: str) -> None:
        t = self.next()
        if t.kind != "KEYWORD" or t.text.upper() != kw:
            raise ParseError(f"expected {kw}, got {t.text!r} at {t.pos}")

    def at_punct(self, p: str) -> bool:
        t = self.peek()
        return t is not None and t.kind == "PUNCT" and t.text == p

    def eat_punct(self, p: str) -> None:
        t = self.next()
        if t.kind != "PUNCT" or t.text != p:
            raise ParseError(f"expected {p!r}, got {t.text!r} at {t.pos}")

    # --- terms ----------------------------------------------------------
    def expand_pname(self, pname: str, pos: int) -> str:
        pre, _, local = pname.partition(":")
        ns = self.prefixes.get(pre)
        if ns is None:
            raise ParseError(f"undefined prefix {pre!r}: at {pos}")
        return ns + local

    def fresh_bnode(self) -> Term:
        self._bnode_n += 1
        return Term(BNODE, f"b{self._bnode_n}")

    def parse_term(self, *, as_predicate: bool = False) -> Term:
        t = self.next()
        if t.kind == "VAR":
            return Term(VAR, t.text[1:])
        if t.kind == "IRIREF":
            iri = t.text[1:-1]
            if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
                iri = self.base + iri
            return Term(IRI, iri)
        if t.kind == "PNAME":
            return Term(IRI, self.expand_pname(t.text, t.pos))
        if t.kind == "KEYWORD" and t.text == "a":
            return Term(IRI, RDF_TYPE)  # 'a' keyword -> rdf:type
        if as_predicate:
            raise ParseError(f"bad predicate {t.text!r} at {t.pos}")
        if t.kind == "BNODE":
            return Term(BNODE, t.text[2:])
        if t.kind in ("STRING", "STRING3"):
            raw = t.text
            body = raw[3:-3] if t.kind == "STRING3" else raw[1:-1]
            value = _unescape(body)
            nxt = self.peek()
            if nxt is not None and nxt.kind == "LANG":
                self.next()
                return Term(LITERAL, value, lang=nxt.text[1:])
            if nxt is not None and nxt.kind == "DTYPE_SEP":
                self.next()
                dt = self.next()
                if dt.kind == "IRIREF":
                    return Term(LITERAL, value, dtype=dt.text[1:-1])
                if dt.kind == "PNAME":
                    return Term(LITERAL, value, dtype=self.expand_pname(dt.text, dt.pos))
                raise ParseError(f"bad datatype at {dt.pos}")
            return Term(LITERAL, value)
        if t.kind == "NUMBER":
            if _NUM_INT.match(t.text):
                return Term(LITERAL, t.text, dtype=XSD + "integer")
            if _NUM_DEC.match(t.text):
                return Term(LITERAL, t.text, dtype=XSD + "decimal")
            return Term(LITERAL, t.text, dtype=XSD + "double")
        if t.kind == "KEYWORD" and t.text.upper() in ("TRUE", "FALSE"):
            return Term(LITERAL, t.text.lower(), dtype=XSD + "boolean")
        if t.kind == "PUNCT" and t.text == "[":
            # [] anonymous bnode or [ p o ; ... ] property list
            node = self.fresh_bnode()
            if not self.at_punct("]"):
                self.parse_predicate_object_list(node)
            self.eat_punct("]")
            return node
        if t.kind == "PUNCT" and t.text == "(":
            return self.parse_collection()
        raise ParseError(f"unexpected term {t.text!r} at {t.pos}")

    def parse_collection(self) -> Term:
        """RDF collection '( e1 e2 ... )' in a term position: expands to the
        rdf:first / rdf:rest bnode chain (the same TPs rdflib's algebra
        yields); '()' is rdf:nil.  The opening '(' is already consumed."""
        if self.at_punct(")"):
            self.next()
            return Term(IRI, RDF_NS + "nil")
        nodes: List[Term] = []
        elems: List[Term] = []
        while not self.at_punct(")"):
            if self.peek() is None:
                raise ParseError("unterminated collection")
            nodes.append(self.fresh_bnode())
            elems.append(self.parse_term())
        self.next()  # ')'
        for i, (node, elem) in enumerate(zip(nodes, elems)):
            self.tps.append(TriplePattern(node, Term(IRI, RDF_NS + "first"), elem))
            rest = nodes[i + 1] if i + 1 < len(nodes) else Term(IRI, RDF_NS + "nil")
            self.tps.append(TriplePattern(node, Term(IRI, RDF_NS + "rest"), rest))
        return nodes[0]

    # --- property paths (decomposable subset) -------------------------------
    # sequence 'p1/p2' and inverse '^p' decompose into plain TPs with fresh
    # intermediate variables; alternative 'p1|p2' decomposes into one TP
    # group per branch (the UNION-equivalent — the reference collected TPs
    # from every UNION arm, so alternatives get the same treatment);
    # quantifiers '+'/'*' expand to bounded-depth sequence arms (VERDICT r2
    # item 4): 'p+' ~ p UNION p/p UNION p/p/p at MAX_PATH_DEPTH=3, and 'p*'
    # adds only a zero-length arm that contributes no TPs, so both yield
    # the same TP arms.  Expansions that exceed the alternative budget
    # (nested quantifiers, quantified multi-alt groups) are counted
    # rejects with code [path_depth] — bounded work per query, never a
    # combinatorial bomb (SURVEY.md U2 subset policy).
    MAX_PATH_ALTS = 8
    MAX_PATH_DEPTH = 3

    def parse_path(self) -> List[List[Tuple[bool, Term]]]:
        """Returns the list of ALTERNATIVES; each alternative is a step list."""
        alts = self.parse_path_seq()
        while self.at_punct("|"):
            self.next()
            alts = alts + self.parse_path_seq()
            if len(alts) > self.MAX_PATH_ALTS:
                raise ParseError("[path_alts] too many property-path alternatives")
        return alts

    def parse_path_seq(self) -> List[List[Tuple[bool, Term]]]:
        alts = self.parse_path_elt()
        while self.at_punct("/"):
            self.next()
            rhs = self.parse_path_elt()
            alts = [a + b for a in alts for b in rhs]
            if len(alts) > self.MAX_PATH_ALTS:
                raise ParseError("[path_alts] too many property-path alternatives")
        return alts

    def parse_path_elt(self) -> List[List[Tuple[bool, Term]]]:
        if self.at_punct("!"):
            # negated property set !iri / !(iri|^iri|...): set complements
            # have no finite BGP decomposition, so they are OUTSIDE the
            # subset by design — a CODED reject (not a generic parse error)
            # so the quarantine rollup can count them distinctly.
            raise ParseError(
                "[path_negated] negated property sets are outside the "
                "BGP-decomposable path subset"
            )
        inverse = False
        if self.at_punct("^"):
            self.next()
            inverse = True
        t = self.peek()
        if t is not None and t.kind == "PUNCT" and t.text == "(":
            self.next()
            inner = self.parse_path()
            self.eat_punct(")")
        else:
            inner = [[(False, self.parse_term(as_predicate=True))]]
        if self.at_punct("*") or self.at_punct("+"):
            kind = self.peek().text
            self.next()
            # exact-closure capture (round 6): a quantifier over ONE plain
            # predicate is evaluable exactly via iterative doubling
            # (graph.path_closure) — remember (pred, inverse, kind) so the
            # wrapper can route single-closure queries to it; the bounded
            # expansion below is still emitted for the stats/mention
            # contract (collect-all-arms), unchanged.
            if len(inner) == 1 and len(inner[0]) == 1:
                p_inv, p_term = inner[0][0]
                self._quant_path = (p_term, p_inv != inverse, kind)
            else:
                self._quant_path = "unsupported"
            base = inner
            expanded = list(base)
            cur = base
            for _ in range(self.MAX_PATH_DEPTH - 1):
                cur = [a + b for a in cur for b in base]
                expanded.extend(cur)
                if len(expanded) > self.MAX_PATH_ALTS:
                    raise ParseError(
                        "[path_depth] quantified path expansion exceeds alternative budget"
                    )
            inner = expanded
        elif self.at_punct("?"):
            # zero-or-one (round 4, VERDICT r3 item 4): exactly the two arms
            # the '*' machinery already models — a zero-length arm (emits no
            # TPs under collect-all-arms semantics, like '*'s) plus the
            # path itself.  A bare '?' lexes as PUNCT; '?name' still wins
            # longest-match as a VAR token, so objects like '?o' after the
            # quantified predicate are unaffected.
            self.next()
            # exact zero-or-one capture (round 6): single-pred 'p?' routes
            # to identity-union-single-hop at evaluation, same plumbing as
            # the '+'/'*' closure route
            if len(inner) == 1 and len(inner[0]) == 1:
                p_inv, p_term = inner[0][0]
                self._quant_path = (p_term, p_inv != inverse, "?")
            else:
                self._quant_path = "unsupported"
            inner = [[]] + inner
            if len(inner) > self.MAX_PATH_ALTS:
                raise ParseError("[path_alts] too many property-path alternatives")
        if inverse:
            inner = [[(not inv, p) for inv, p in reversed(alt)] for alt in inner]
        return inner

    def fresh_path_var(self) -> Term:
        self._path_n += 1
        return Term(VAR, f"_path{self._path_n}")

    def emit_path(self, subject: Term, steps: List[Tuple[bool, Term]], obj: Term) -> None:
        nodes = [subject] + [self.fresh_path_var() for _ in steps[1:]] + [obj]
        for i, (inv, p) in enumerate(steps):
            s_, o_ = nodes[i], nodes[i + 1]
            self.tps.append(TriplePattern(o_, p, s_) if inv else TriplePattern(s_, p, o_))

    # --- triples block ----------------------------------------------------
    def parse_predicate_object_list(self, subject: Term) -> None:
        while True:
            self._quant_path = None
            alts = self.parse_path()
            if len(alts) > 1 or not alts[0] or len(alts[0]) > 1 or alts[0][0][0]:
                self.simple = False  # path sugar used (incl. a zero-length '?' arm)
            if len(alts) > 1:
                # >1 TP group emitted: the flat TP list unions the arms'
                # patterns, which a conjunctive evaluation would JOIN — the
                # evaluator must refuse (sparql/eval.py; single-arm '/' and
                # '^' decompositions stay conjunctive and evaluable)
                self.multi_arm = True
            # pure single-pred quantifier? (alts must be exactly the 1..MAX
            # depth expansions of one step — guards against a nested
            # quantifier inside a sequence/alternative being misattributed)
            qp = self._quant_path
            pure_quant = isinstance(qp, tuple) and (
                (
                    qp[2] in ("+", "*")
                    and len(alts) == self.MAX_PATH_DEPTH
                    and sorted(len(a) for a in alts)
                    == list(range(1, self.MAX_PATH_DEPTH + 1))
                    and len({s for a in alts for s in a}) == 1
                )
                or (
                    qp[2] == "?"
                    and len(alts) == 2
                    and sorted(len(a) for a in alts) == [0, 1]
                )
            )
            pure_alt = (
                qp is None and len(alts) > 1 and all(len(a) >= 1 for a in alts)
            )
            while True:
                obj = self.parse_term()
                if pure_quant:
                    self.closure_specs.append((subject, qp[0], qp[1], qp[2], obj))
                elif pure_alt:
                    self.alt_specs.append(
                        (subject, tuple(tuple(a) for a in alts), obj)
                    )
                for steps in alts:
                    self.emit_path(subject, steps, obj)
                if self.at_punct(","):
                    self.next()
                    continue
                break
            if self.at_punct(";"):
                self.next()
                if self.at_punct(";") or self.at_punct(".") or self.at_punct("}") or self.peek() is None:
                    continue  # dangling ';' tolerated
                continue
            break

    def parse_triples_block(self) -> None:
        while True:
            subj = self.parse_term()
            # a bare [ p o ] as the whole triple (no following predicate) is legal
            if subj.kind == BNODE and (self.at_punct(".") or self.at_punct("}")):
                pass
            else:
                self.parse_predicate_object_list(subj)
            if self.at_punct("."):
                self.next()
                t = self.peek()
                if t is None or (t.kind == "PUNCT" and t.text == "}"):
                    break
                if t.kind == "KEYWORD" and t.text.upper() in _COMPLEX:
                    break
                if t.kind == "PUNCT" and t.text == "{":
                    break
                continue
            break

    # --- group graph pattern ------------------------------------------------
    def parse_group(self) -> None:
        self._depth += 1
        self.eat_punct("{")
        # filters parsed in THIS group validate against the group's own
        # variable scope (SPARQL 1.1 section 8.2: a FILTER constrains its
        # group, wherever it appears in it) — a filter referencing a var
        # bound only OUTSIDE the group is always unbound -> error -> empty
        # under the spec, which a global application would get wrong, so
        # those demote to complex instead of evaluating.
        group_filters: List[tuple] = []
        tp_start = len(self.tps)
        bind_start = len(self.binds)
        while not self.at_punct("}"):
            t = self.peek()
            if t is None:
                raise ParseError("unterminated group")
            up = t.text.upper() if t.kind == "KEYWORD" else ""
            if t.kind == "PUNCT" and t.text == "{":
                s0, f0 = len(self.tps), len(self.filters)
                self.parse_group()  # nested group (possibly lhs of UNION)
                if self.at_kw("UNION"):
                    self.simple = False  # stats: UNION is a non-simple feature
                    arms = [(s0, len(self.tps), tuple(self.filters[f0:]))]
                    del self.filters[f0:]
                    while self.at_kw("UNION"):
                        self.next()
                        s, f = len(self.tps), len(self.filters)
                        self.parse_group()
                        arms.append((s, len(self.tps), tuple(self.filters[f:])))
                        del self.filters[f:]
                    if self._depth == 1 and not self.union_arms:
                        # one top-level chain is evaluable (NULL-padded
                        # union of conjunctive arms, sparql/eval.py); the
                        # wrapper validates it is the WHOLE group
                        self.union_arms = arms
                    else:
                        self.complex = True  # nested chain / second chain
            elif up == "OPTIONAL":
                self.simple = False  # stats: OPTIONAL is a non-simple feature
                self.next()
                if self._depth == 1:
                    # top-level OPTIONAL: capture the group as a span so the
                    # evaluator can LeftJoin it (sparql/eval.py).  Its
                    # FILTERs move out of the main filter list (they apply
                    # to the optional side, SPARQL 1.1 section 8.3.3 —
                    # equivalent pre-join when scoped to the group, which
                    # the group-exit scope check guarantees).  A complex
                    # body (nested OPTIONAL/UNION/...) flips self.complex
                    # inside parse_group and the whole query demotes anyway.
                    t_start = len(self.tps)
                    f_start = len(self.filters)
                    self.parse_group()
                    ofilters = tuple(self.filters[f_start:])
                    del self.filters[f_start:]
                    self.optional_spans.append((t_start, len(self.tps), ofilters))
                else:
                    # OPTIONAL nested below the main group: its LeftJoin
                    # attaches to the INNER group's solutions — not
                    # expressible on the flat TP list, so not evaluable
                    self.complex = True
                    self.parse_group()
            elif up in ("MINUS",):
                self.simple = False  # stats: MINUS is a non-simple feature
                self.next()
                if self._depth == 1:
                    # top-level MINUS: same span capture as OPTIONAL — the
                    # evaluator LEFT ANTI joins the group on the shared
                    # vars (exact for always-bound BGP solutions; no
                    # shared vars keeps everything per SPARQL 8.3)
                    t_start = len(self.tps)
                    f_start = len(self.filters)
                    self.parse_group()
                    mfilters = tuple(self.filters[f_start:])
                    del self.filters[f_start:]
                    self.minus_spans.append((t_start, len(self.tps), mfilters))
                else:
                    self.complex = True
                    self.parse_group()
            elif up == "GRAPH":
                self.simple = False
                self.complex = True
                self.next()
                self.parse_term()  # var or iri
                self.parse_group()
            elif up == "SERVICE":
                self.simple = False
                self.complex = True
                self.next()
                if self.at_kw("SILENT"):
                    self.next()
                self.parse_term()
                self.parse_group()
            elif up == "FILTER":
                self.simple = False  # stats: FILTER is a non-simple feature
                self.next()
                # FILTER [NOT] EXISTS { ... }: captured as a span at depth
                # 1 (semi/anti join at evaluation — pattern vars stay
                # LOCAL, exactly SPARQL's non-binding EXISTS scope);
                # elsewhere the group still parses for the stats contract
                neg = False
                if self.at_kw("NOT"):
                    nxt = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
                    if nxt is not None and nxt.kind == "KEYWORD" and nxt.text.upper() == "EXISTS":
                        self.next()
                        neg = True
                look = self.toks[self.i + 1] if self.i + 1 < len(self.toks) else None
                if (
                    self.at_kw("EXISTS")
                    and look is not None
                    and look.kind == "PUNCT"
                    and look.text == "{"
                ):
                    self.next()  # EXISTS
                    t_start = len(self.tps)
                    f_start = len(self.filters)
                    self.parse_group()
                    efilters = tuple(self.filters[f_start:])
                    del self.filters[f_start:]
                    if self._depth == 1:
                        self.exists_spans.append(
                            (neg, t_start, len(self.tps), efilters)
                        )
                    else:
                        self.complex = True
                elif neg:
                    # NOT followed by something else: out of subset
                    self.complex = True
                    self.skip_filter_constraint()
                else:
                    # evaluable subset first; anything else falls back to
                    # the skip-and-mark-complex path (token-idx backtrack)
                    saved_i = self.i
                    try:
                        group_filters.append(self.parse_filter_expr())
                    except ParseError:
                        self.i = saved_i
                        self.complex = True
                        self.skip_filter_constraint()
            elif up == "BIND":
                self.simple = False  # stats: BIND is a non-simple feature
                self.next()
                # evaluable subset: BIND((operand | CONCAT/UCASE/LCASE/
                # STRLEN/STR over operands) AS ?fresh) at depth 1 —
                # compiled to withColumn; anything else skips + complex
                saved_i = self.i
                try:
                    expr, bvar = self.parse_bind_expr()
                    if self._depth == 1:
                        self.binds.append((expr, bvar))
                    else:
                        self.complex = True
                except ParseError:
                    self.i = saved_i
                    self.complex = True
                    self.skip_parens()
            elif up == "VALUES":
                self.simple = False  # stats: VALUES is a non-simple feature
                self.next()
                self.parse_values()  # captures or demotes (see parse_values)
            elif up == "SELECT":
                # subquery: { SELECT ... WHERE { ... } modifiers } — the
                # reference (via rdflib algebra walk) collected TPs from the
                # inner WHERE too, so its group parses into the same
                # accumulator (VERDICT r1 item 5: sub-SELECT TP collection).
                self.simple = False
                self.complex = True
                self.next()
                self.skip_select_clause()
                if self.at_kw("WHERE"):
                    self.next()
                self.parse_group()
                self.skip_solution_modifiers()
            else:
                self.parse_triples_block()
            if self.at_punct("."):
                self.next()
        self.eat_punct("}")
        if group_filters:
            scope = set()
            for tp in self.tps[tp_start:]:
                for term in (tp.s, tp.p, tp.o):
                    if term.kind == VAR:
                        scope.add(term.value)
            # BIND targets join the group scope for subsequent FILTERs
            scope.update(v for _, v in self.binds[bind_start:])
            for fx in group_filters:
                if self._fx_vars(fx) <= scope:
                    self.filters.append(fx)
                else:
                    self.complex = True  # out-of-scope var: see note above
        self._depth -= 1

    def skip_parens(self) -> None:
        self.eat_punct("(")
        depth = 1
        while depth:
            t = self.next()
            if t.kind == "PUNCT" and t.text == "(":
                depth += 1
            elif t.kind == "PUNCT" and t.text == ")":
                depth -= 1

    # --- FILTER expressions (evaluable subset, round 6) ---------------------
    # constraint := '(' expr ')' | call
    # expr  := and ('||' and)* ; and := unary ('&&' unary)* ;
    # unary := '!' unary | prim ;
    # prim  := '(' expr ')' | call | operand CMPOP operand ;
    # operand := ?var | literal | IRI | STR(?var) ;
    # call  := REGEX(op, op[, op]) | CONTAINS/STRSTARTS/STRENDS(op, op)
    # AST = picklable tuples, compiled to Columns in sparql/eval.py.
    # Anything else (BOUND, arithmetic, IN, EXISTS, functions over exprs)
    # raises ParseError here and falls back to the skip path (complex=True).
    _FILTER_FNS = {"REGEX", "CONTAINS", "STRSTARTS", "STRENDS"}
    _CMP_OPS = {"=", "!=", "<", "<=", ">", ">="}

    def parse_filter_expr(self) -> tuple:
        t = self.peek()
        if t is not None and t.kind == "PUNCT" and t.text == "(":
            self.next()
            e = self._fx_or()
            self.eat_punct(")")
            return e
        if t is not None and t.kind == "KEYWORD" and t.text.upper() in self._FILTER_FNS:
            return self._fx_call()
        raise ParseError("unsupported FILTER form")

    def _fx_or(self) -> tuple:
        e = self._fx_and()
        while self.at_punct("||"):
            self.next()
            e = ("or", e, self._fx_and())
        return e

    def _fx_and(self) -> tuple:
        e = self._fx_unary()
        while self.at_punct("&&"):
            self.next()
            e = ("and", e, self._fx_unary())
        return e

    def _fx_unary(self) -> tuple:
        if self.at_punct("!"):
            self.next()
            return ("not", self._fx_unary())
        return self._fx_prim()

    def _fx_prim(self) -> tuple:
        t = self.peek()
        if t is None:
            raise ParseError("truncated FILTER")
        if t.kind == "PUNCT" and t.text == "(":
            self.next()
            e = self._fx_or()
            self.eat_punct(")")
            return e
        if t.kind == "KEYWORD" and t.text.upper() in self._FILTER_FNS:
            return self._fx_call()
        lhs = self._fx_operand()
        t = self.peek()
        if t is not None and t.kind == "PUNCT" and t.text in self._CMP_OPS:
            self.next()
            return ("cmp", t.text, lhs, self._fx_operand())
        raise ParseError("bare FILTER operand (only comparisons/calls supported)")

    def _fx_operand(self) -> tuple:
        t = self.peek()
        if t is None:
            raise ParseError("truncated FILTER operand")
        if t.kind == "VAR":
            self.next()
            return ("var", t.text[1:])
        if t.kind == "NUMBER":
            self.next()
            return ("lit", float(t.text), "num")
        if t.kind == "KEYWORD" and t.text.upper() == "STR":
            # STR(?x): identity over this engine's plain-string term model
            self.next()
            self.eat_punct("(")
            v = self._fx_operand()
            self.eat_punct(")")
            return v
        if t.kind in ("STRING", "STRING3", "IRIREF", "PNAME") or (
            t.kind == "KEYWORD" and t.text.upper() in ("TRUE", "FALSE")
        ):
            term = self.parse_term()
            return ("lit", term.value, "str")
        raise ParseError(f"unsupported FILTER operand at {t.pos}")

    def _fx_call(self) -> tuple:
        name = self.next().text.upper()
        self.eat_punct("(")
        args = [self._fx_operand()]
        while self.at_punct(","):
            self.next()
            args.append(self._fx_operand())
        self.eat_punct(")")
        if name == "REGEX":
            if len(args) not in (2, 3):
                raise ParseError("REGEX takes 2 or 3 arguments")
            if len(args) == 3 and (args[2][0] != "lit" or args[2][1] not in ("i", "")):
                raise ParseError("only the 'i' REGEX flag is supported")
        elif len(args) != 2:
            raise ParseError(f"{name} takes 2 arguments")
        return ("call", name.lower(), tuple(args))

    @staticmethod
    def _fx_vars(ast: tuple) -> set:
        k = ast[0]
        if k == "var":
            return {ast[1]}
        if k == "lit":
            return set()
        if k in ("or", "and", "cmp"):
            return set().union(*(_Parser._fx_vars(a) for a in ast[2 if k == "cmp" else 1:]))
        if k == "not":
            return _Parser._fx_vars(ast[1])
        if k == "call":
            return set().union(*(_Parser._fx_vars(a) for a in ast[2]))
        return set()

    def skip_filter_constraint(self) -> None:
        t = self.peek()
        if t is None:
            raise ParseError("bad FILTER")
        if t.kind == "PUNCT" and t.text == "(":
            self.skip_parens()
        elif t.kind == "KEYWORD":
            self.next()  # builtin name (regex, bound, EXISTS...)
            if self.at_kw("EXISTS"):  # NOT EXISTS
                self.next()
            if self.at_punct("("):
                self.skip_parens()
            elif self.at_punct("{"):
                self.parse_group()  # FILTER EXISTS { ... } contributes TPs
        else:
            raise ParseError(f"bad FILTER at {t.pos}")

    def parse_data_term(self):
        """One VALUES data-block value: IRI / literal / UNDEF (vars and
        bnodes are NOT legal here — SPARQL 1.1 grammar rule [65]
        DataBlockValue).  Returns the plain-string value for the
        evaluator, or None for UNDEF."""
        if self.at_kw("UNDEF"):
            self.next()
            return None
        t = self.peek()
        if t is None:
            raise ParseError("[values] truncated VALUES data block")
        if t.kind in ("IRIREF", "PNAME", "STRING", "STRING3", "NUMBER") or (
            t.kind == "KEYWORD" and t.text.upper() in ("TRUE", "FALSE")
        ):
            term = self.parse_term()
            if term.kind not in (IRI, LITERAL):
                raise ParseError(f"[values] bad VALUES value at {t.pos}")
            return term.value
        raise ParseError(f"[values] bad VALUES value {t.text!r} at {t.pos}")

    def parse_values(self) -> None:
        """VALUES inline data, both forms, with term-level validation
        (VERDICT r1 item 5).  Contributes no TPs — VALUES binds solutions,
        it does not add graph patterns.  Round 6: ONE top-level UNDEF-free
        clause is captured for evaluation (an inline-table equi-join,
        sparql/eval.py); UNDEF rows need compatibility joins and demote,
        as does a second clause or a nested one."""
        vars_ = []
        rows = []
        undef = False
        t = self.peek()
        if t is not None and t.kind == "VAR":  # VALUES ?x { v1 v2 ... }
            vars_.append(t.text[1:])
            self.next()
            self.eat_punct("{")
            while not self.at_punct("}"):
                v = self.parse_data_term()
                undef = undef or v is None
                rows.append((v,))
            self.next()
        elif t is not None and t.kind == "PUNCT" and t.text == "(":
            # VALUES (?x ?y) { (v1 v2) (UNDEF v3) ... }
            self.next()
            while not self.at_punct(")"):
                v = self.next()
                if v.kind != "VAR":
                    raise ParseError(f"[values] bad VALUES var at {v.pos}")
                vars_.append(v.text[1:])
            self.next()
            self.eat_punct("{")
            while not self.at_punct("}"):
                self.eat_punct("(")
                row = []
                while not self.at_punct(")"):
                    row.append(self.parse_data_term())
                self.next()
                if len(row) != len(vars_):
                    raise ParseError("[values] VALUES row arity mismatch")
                undef = undef or any(v is None for v in row)
                rows.append(tuple(row))
            self.next()
        else:
            raise ParseError("[values] bad VALUES")
        if self._depth == 1 and self.values_clause is None and not undef and rows:
            self.values_clause = (tuple(vars_), tuple(rows))
        else:
            self.complex = True

    # --- top level -----------------------------------------------------------
    def parse_prologue(self) -> None:
        while True:
            if self.at_kw("PREFIX"):
                self.next()
                pn = self.next()
                if pn.kind != "PNAME" or not pn.text.endswith(":"):
                    raise ParseError(f"bad PREFIX name at {pn.pos}")
                iri = self.next()
                if iri.kind != "IRIREF":
                    raise ParseError(f"bad PREFIX IRI at {iri.pos}")
                self.prefixes[pn.text[:-1]] = iri.text[1:-1]
            elif self.at_kw("BASE"):
                self.next()
                iri = self.next()
                if iri.kind != "IRIREF":
                    raise ParseError(f"bad BASE IRI at {iri.pos}")
                self.base = iri.text[1:-1]
            else:
                return

    def skip_select_clause(self, record: bool = False) -> None:
        """``record=True`` only for the TOP-LEVEL SELECT: captures the
        projected var names (and DISTINCT) for the evaluator; sub-SELECT
        clauses are skipped as before (their TPs are still collected but
        their projection is not this query's)."""
        if self.at_kw("DISTINCT", "REDUCED"):
            if record and self.at_kw("DISTINCT"):
                self.select_distinct = True
            self.next()
        saw = False
        star = False
        saw_expr = False
        vars_: List[str] = []
        while True:
            t = self.peek()
            if t is None:
                raise ParseError("truncated SELECT")
            if t.kind == "VAR":
                self.next()
                vars_.append(t.text[1:])
                saw = True
            elif t.kind == "PUNCT" and t.text == "*":
                self.next()
                star = True
                saw = True
            elif t.kind == "PUNCT" and t.text == "(":
                # (expr AS ?x) projection expression: the evaluable subset
                # is a single aggregate call (COUNT/SUM/AVG/MIN/MAX over a
                # var or COUNT(*), optional DISTINCT) — recorded with its
                # alias; anything else skips and sets complex
                if record and self._try_agg_projection():
                    vars_.append(self.aggregates[-1][3])
                    saw = True
                    self.simple = False
                    continue
                self.skip_parens()
                self.simple = False
                self.complex = True
                saw = True
                saw_expr = True
            else:
                break
        if not saw:
            raise ParseError("empty SELECT clause")
        if record and not star and not saw_expr:
            self.select_vars = vars_

    def skip_dataset_clauses(self) -> None:
        while self.at_kw("FROM"):
            self.next()
            if self.at_kw("NAMED"):
                self.next()
            t = self.next()
            if t.kind not in ("IRIREF", "PNAME"):
                raise ParseError(f"bad FROM at {t.pos}")

    def skip_solution_modifiers(self, record: bool = False) -> None:
        # ORDER BY / LIMIT / OFFSET / GROUP BY / HAVING.  ``record=True``
        # (the top-level form only) captures the evaluable subset —
        # ORDER BY on plain vars (ASC()/DESC() around a single var),
        # integer LIMIT/OFFSET, GROUP BY on plain vars; expression sorts,
        # expression groups and HAVING set complex instead.  Sub-SELECT
        # modifiers stay skipped as before.
        while True:
            if self.at_kw("ORDER"):
                self.next()
                self.eat_kw("BY")
                while True:
                    t = self.peek()
                    if t is None:
                        return
                    if t.kind == "VAR":
                        self.next()
                        if record:
                            self.order_by.append((t.text[1:], False))
                    elif t.kind == "KEYWORD" and t.text.upper() in ("ASC", "DESC"):
                        desc = t.text.upper() == "DESC"
                        self.next()
                        if record and self._try_sort_var(desc):
                            continue
                        self.skip_parens()
                        if record:
                            self.complex = True  # expression sort key
                    elif t.kind == "PUNCT" and t.text == "(":
                        self.skip_parens()
                        if record:
                            self.complex = True  # expression sort key
                    else:
                        break
            elif self.at_kw("GROUP"):
                self.next()
                self.eat_kw("BY")
                while True:
                    t = self.peek()
                    if t is not None and t.kind == "VAR":
                        self.next()
                        if record:
                            self.group_by.append(t.text[1:])
                    elif t is not None and t.kind == "PUNCT" and t.text == "(":
                        self.skip_parens()
                        if record:
                            self.complex = True  # expression group key
                    else:
                        break
            elif self.at_kw("HAVING"):
                self.next()
                self.skip_parens()
                if record:
                    self.complex = True
            elif self.at_kw("LIMIT", "OFFSET"):
                which = self.peek().text.upper()
                self.next()
                t = self.next()
                if t.kind != "NUMBER":
                    raise ParseError(f"bad LIMIT/OFFSET at {t.pos}")
                if record:
                    if not _NUM_INT.match(t.text):
                        raise ParseError(f"bad LIMIT/OFFSET at {t.pos}")
                    if which == "LIMIT":
                        self.limit = int(t.text)
                    else:
                        self.offset = int(t.text)
            else:
                return

    _BIND_FNS = {"CONCAT", "UCASE", "LCASE", "STRLEN"}

    def parse_bind_expr(self) -> tuple:
        """'( value-expr AS ?var )' for BIND.  Value exprs: a plain
        operand, or CONCAT(op, ...) / UCASE(op) / LCASE(op) / STRLEN(op)
        (STR() folds to identity inside _fx_operand).  Raises ParseError
        on anything else (the caller backtracks to the skip path)."""
        self.eat_punct("(")
        expr = self._bind_value()
        self.eat_kw("AS")
        v = self.next()
        if v.kind != "VAR":
            raise ParseError("bad BIND target")
        self.eat_punct(")")
        return expr, v.text[1:]

    def _bind_value(self) -> tuple:
        t = self.peek()
        if t is not None and t.kind == "KEYWORD" and t.text.upper() in self._BIND_FNS:
            name = self.next().text.upper()
            self.eat_punct("(")
            args = [self._bind_value()]  # nested calls compose
            while self.at_punct(","):
                self.next()
                args.append(self._bind_value())
            self.eat_punct(")")
            if name != "CONCAT" and len(args) != 1:
                raise ParseError(f"{name} takes 1 argument")
            return ("fn", name.lower(), tuple(args))
        return self._fx_operand()

    _AGG_FNS = {"COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT"}

    def _try_agg_projection(self) -> bool:
        """'( AGG([DISTINCT] ?v|*) AS ?alias )' — the evaluable projection
        expression; GROUP_CONCAT additionally takes the
        '; SEPARATOR="..."' clause.  Appends (func, var|None, distinct,
        alias, sep) to self.aggregates; backtracks and returns False on
        anything else."""
        saved = self.i
        try:
            self.eat_punct("(")
            fn = self.next()
            if fn.kind != "KEYWORD" or fn.text.upper() not in self._AGG_FNS:
                raise ParseError("not an aggregate")
            self.eat_punct("(")
            distinct = False
            if self.at_kw("DISTINCT"):
                if fn.text.upper() not in ("COUNT", "GROUP_CONCAT"):
                    # SUM/AVG(DISTINCT) have no direct Column form —
                    # outside the subset, falls back to complex
                    raise ParseError("DISTINCT only under COUNT/GROUP_CONCAT")
                distinct = True
                self.next()
            t = self.peek()
            if t is not None and t.kind == "VAR":
                self.next()
                var: Optional[str] = t.text[1:]
            elif (
                t is not None and t.kind == "PUNCT" and t.text == "*"
                and fn.text.upper() == "COUNT"
            ):
                self.next()
                var = None
            else:
                raise ParseError("aggregate over an expression")
            sep = " "  # the SPARQL 1.1 default separator
            if self.at_punct(";"):
                if fn.text.upper() != "GROUP_CONCAT":
                    raise ParseError("separator only under GROUP_CONCAT")
                self.next()
                s = self.next()
                if s.kind != "KEYWORD" or s.text.upper() != "SEPARATOR":
                    raise ParseError("expected SEPARATOR")
                self.eat_punct("=")
                st = self.next()
                if st.kind not in ("STRING", "STRING3"):
                    raise ParseError("bad SEPARATOR string")
                body = st.text[3:-3] if st.kind == "STRING3" else st.text[1:-1]
                sep = _unescape(body)
            self.eat_punct(")")
            self.eat_kw("AS")
            a = self.next()
            if a.kind != "VAR":
                raise ParseError("bad aggregate alias")
            self.eat_punct(")")
        except ParseError:
            self.i = saved
            return False
        self.aggregates.append((fn.text.upper(), var, distinct, a.text[1:], sep))
        return True

    def _try_sort_var(self, desc: bool) -> bool:
        """ASC(?v) / DESC(?v) with a single plain var — the evaluable sort
        form.  Backtracks and returns False on anything else."""
        saved = self.i
        try:
            self.eat_punct("(")
            t = self.next()
            if t.kind != "VAR":
                raise ParseError("not a plain sort var")
            self.eat_punct(")")
        except ParseError:
            self.i = saved
            return False
        self.order_by.append((t.text[1:], desc))
        return True

    def parse_query(self) -> Tuple[str, List[TriplePattern], bool]:
        self.parse_prologue()
        t = self.peek()
        if t is None or t.kind != "KEYWORD":
            raise ParseError("missing query form")
        form = t.text.upper()
        if form == "SELECT":
            self.next()
            self.skip_select_clause(record=True)
            self.skip_dataset_clauses()
            if self.at_kw("WHERE"):
                self.next()
            self.parse_group()
            self.skip_solution_modifiers(record=True)
        elif form == "ASK":
            self.next()
            self.skip_dataset_clauses()
            if self.at_kw("WHERE"):
                self.next()
            self.parse_group()
        elif form == "CONSTRUCT":
            self.next()
            if self.at_punct("{"):
                # CONSTRUCT template: parsed into a SEPARATE accumulator —
                # the BGP statistics keep using only the WHERE clause's TPs
                # (the reference extracted the BGP from WHERE,
                # [R:QueryManager.py], SURVEY.md 2.9 U2), while the round-6
                # evaluator (sparql/eval.py:eval_construct) instantiates
                # the template per WHERE solution.
                saved = self.tps
                saved_spans = self.optional_spans
                saved_filters = self.filters
                self.tps = []
                self.optional_spans = []
                self.filters = []
                self.parse_group()
                if self.optional_spans or self.filters:
                    # OPTIONAL/FILTER are not template syntax; the TPs were
                    # still collected (permissive parse) but the query is
                    # not evaluable as written
                    self.complex = True
                self.template = self.tps
                self.tps = saved
                self.optional_spans = saved_spans
                self.filters = saved_filters
            self.skip_dataset_clauses()
            self.eat_kw("WHERE")
            self.parse_group()
            # record so a CONSTRUCT with ORDER/LIMIT/... demotes instead of
            # silently dropping the modifier (wrapper check)
            self.skip_solution_modifiers(record=True)
        elif form == "DESCRIBE":
            self.next()
            saw = False
            while True:
                tt = self.peek()
                if tt is not None and tt.kind == "VAR":
                    self.next()
                    self.describe_terms.append(Term(VAR, tt.text[1:]))
                    saw = True
                elif tt is not None and tt.kind == "IRIREF":
                    self.next()
                    self.describe_terms.append(Term(IRI, tt.text[1:-1]))
                    saw = True
                elif tt is not None and tt.kind == "PNAME":
                    self.describe_terms.append(
                        Term(IRI, self.expand_pname(tt.text, tt.pos))
                    )
                    self.next()
                    saw = True
                elif tt is not None and tt.kind == "PUNCT" and tt.text == "*":
                    self.next()
                    self.describe_star = True
                    saw = True
                else:
                    break
            self.skip_dataset_clauses()
            if self.at_kw("WHERE"):
                self.next()
                self.parse_group()
            elif self.at_punct("{"):
                self.parse_group()
            elif not saw:
                raise ParseError("empty DESCRIBE")
            self.skip_solution_modifiers(record=True)  # demote-not-drop
        else:
            raise ParseError(f"unsupported query form {form!r}")
        t = self.peek()
        if t is not None:
            raise ParseError(f"trailing tokens at {t.pos}: {t.text!r}")
        return form, self.tps, self.simple


_ESCAPES = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            # \uXXXX / \UXXXXXXXX with hex validation: malformed escapes fall
            # through to the raw characters instead of raising (a single bad
            # literal must never kill a mapInPandas task — ADVICE round 1)
            if nxt in ("u", "U"):
                width = 4 if nxt == "u" else 8
                hexs = s[i + 2 : i + 2 + width]
                if len(hexs) == width and all(ch in "0123456789abcdefABCDEF" for ch in hexs):
                    cp = int(hexs, 16)
                    if cp <= 0x10FFFF:
                        out.append(chr(cp))
                        i += 2 + width
                        continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_query(text: str) -> ParseResult:
    """Parse one SPARQL query string; never raises (rejects are counted,
    [R:Stat.py] skip-and-count behavior)."""
    try:
        tokens = tokenize(text)
        p = _Parser(tokens)
        form, tps, simple = p.parse_query()
        # FAST PATH — plain query, no evaluation features: this wrapper
        # runs once per query inside the extraction pipeline's pandas
        # UDFs, so the common case must not pay the feature bookkeeping
        # below (measured ~8us/parse, a real tax at millions of log
        # queries; the full path is behavior-identical for these inputs)
        if not (
            p.optional_spans or p.minus_spans or p.union_arms
            or p.values_clause or p.binds or p.closure_specs or p.alt_specs
            or p.exists_spans or p.describe_terms or p.describe_star
            or p.filters or p.template is not None
            or p.order_by or p.group_by or p.aggregates
            or p.limit is not None or p.offset is not None
        ):
            return ParseResult(
                True, form, tps, simple, None,
                select_vars=p.select_vars if form == "SELECT" else None,
                distinct=p.select_distinct,
                evaluable=(
                    form in ("SELECT", "ASK", "CONSTRUCT")
                    and not p.complex
                    and not p.multi_arm
                    and bool(tps)
                ),
                base_tps=tps,
            )
        # OPTIONAL and MINUS spans share the base-split and ordering rules:
        # every base TP must PRECEDE the first span (SPARQL algebra builds
        # left-to-right — a base pattern after a LeftJoin/Minus applies
        # after it, which base-first evaluation would get wrong when vars
        # overlap), spans must be non-empty, the base non-empty, and
        # OPTIONAL+MINUS may not mix (their relative algebra order is not
        # represented on the flat list).
        spans = p.optional_spans + p.minus_spans
        exists_filters = tuple(
            (neg, tuple(tps[s:e]), fx) for neg, s, e, fx in p.exists_spans
        )
        if p.exists_spans and (spans or p.union_arms):
            # EXISTS shared vars could be optional-bound (NULL) — the
            # semi/anti join would diverge from the correlated
            # substitution semantics, so the mix demotes
            p.complex = True
        if spans or p.exists_spans:
            in_span = set()
            for s, e, _ in spans:
                in_span.update(range(s, e))
            for _, s, e, _ in p.exists_spans:
                in_span.update(range(s, e))
            base = [tp for i, tp in enumerate(tps) if i not in in_span]
            optionals = tuple((tuple(tps[s:e]), fx) for s, e, fx in p.optional_spans)
            minuses = tuple((tuple(tps[s:e]), fx) for s, e, fx in p.minus_spans)
        else:
            # fast path: no spans — this wrapper runs once per query inside
            # the extraction pipeline's pandas UDFs, so the common case
            # (plain BGP) must not pay list copies for absent features
            in_span = ()
            base = tps
            optionals = ()
            minuses = ()
        opt_ok = bool(spans) and not p.complex
        if opt_ok:
            first = min(s for s, _, _ in spans)
            opt_ok = all(i < first for i in range(len(tps)) if i not in in_span)
            opt_ok = opt_ok and all(s < e for s, e, _ in spans) and bool(base)
            opt_ok = opt_ok and not (p.optional_spans and p.minus_spans)
        vals = p.values_clause
        if vals is not None:
            # VALUES vars must be bound in the conjunctive base (or in
            # EVERY union arm): inner equi-join is then exact.  A VALUES
            # var that can be unbound (optional-only, or missing from an
            # arm) needs compatibility semantics -> demote.
            def _tp_vars(tp_list):
                return {
                    t_.value
                    for tp_ in tp_list
                    for t_ in (tp_.s, tp_.p, tp_.o)
                    if t_.kind == VAR
                }

            if p.union_arms:
                ok = all(
                    set(vals[0]) <= _tp_vars(tps[s:e]) for s, e, _ in p.union_arms
                )
            else:
                ok = set(vals[0]) <= _tp_vars(base)
            if not ok:
                p.complex = True
                vals = None
        # BIND validation: operand vars must be base-bound (optional-only
        # operands could be NULL — demoted instead of diverging), targets
        # fresh and distinct; no mixing with union/path routes
        bind_vars = set()
        if p.binds:
            tp_vars_all = {
                t_.value
                for tp_ in tps
                for t_ in (tp_.s, tp_.p, tp_.o)
                if t_.kind == VAR
            }
            base_vars = {
                t_.value
                for tp_ in base
                for t_ in (tp_.s, tp_.p, tp_.o)
                if t_.kind == VAR
            }

            def _operand_vars(ast):
                if ast[0] == "var":
                    return {ast[1]}
                if ast[0] == "fn":
                    return set().union(*(_operand_vars(a) for a in ast[2]))
                return set()

            bind_vars = {v for _, v in p.binds}
            if (
                p.union_arms
                or len(bind_vars) != len(p.binds)
                or bind_vars & tp_vars_all
                or not all(
                    _operand_vars(e) <= base_vars for e, _ in p.binds
                )
            ):
                p.complex = True
        # solution modifiers: validated here so out-of-subset combinations
        # demote instead of silently dropping a modifier
        has_mods = bool(
            p.order_by or p.limit is not None or p.offset is not None
            or p.group_by or p.aggregates
        )
        if has_mods and form != "SELECT":
            p.complex = True  # LIMIT/ORDER on CONSTRUCT/DESCRIBE: refuse
        if form == "SELECT" and (p.aggregates or p.group_by):
            agg_aliases = {t[3] for t in p.aggregates}
            plain = [v for v in (p.select_vars or []) if v not in agg_aliases]
            # grouped projection: every plain projected var must be a group
            # key; aggregate input vars must be solution vars
            all_vars = {
                t_.value
                for tp_ in tps
                for t_ in (tp_.s, tp_.p, tp_.o)
                if t_.kind == VAR
            } | bind_vars
            if (
                p.select_vars is None  # SELECT * with GROUP BY: not well-formed
                or not set(plain) <= set(p.group_by)
                or not set(p.group_by) <= all_vars
                or not all(t[1] is None or t[1] in all_vars for t in p.aggregates)
            ):
                p.complex = True
        if form == "SELECT" and p.order_by:
            all_vars = {
                t_.value
                for tp_ in tps
                for t_ in (tp_.s, tp_.p, tp_.o)
                if t_.kind == VAR
            } | bind_vars
            if p.aggregates or p.group_by:
                sortable = set(p.select_vars or [])
            elif p.select_distinct:
                # DISTINCT projects first: sort keys must be projected
                sortable = set(p.select_vars) if p.select_vars is not None else all_vars
            else:
                sortable = all_vars  # sort before projection (spec order)
            if not {v for v, _ in p.order_by} <= sortable:
                p.complex = True
        # exact-closure route: the whole WHERE is one quantified
        # single-pred path (its bounded expansion is the ONLY tps content)
        if p.exists_spans and not base:
            p.complex = True  # WHERE is only a FILTER EXISTS: no base BGP
        closure_ok = alt_ok = False
        if p.closure_specs or p.alt_specs:
            n_expansion = _Parser.MAX_PATH_DEPTH * (_Parser.MAX_PATH_DEPTH + 1) // 2
            _path_route_ok = (
                form in ("SELECT", "ASK")
                and not p.complex
                and not p.optional_spans
                and not p.minus_spans
                and not p.union_arms
                and vals is None
                and not p.binds
                and not p.exists_spans
            )
            closure_ok = (
                _path_route_ok
                and len(p.closure_specs) == 1
                and not p.alt_specs
                # '+'/'*' expand to the full depth ladder; '?' emits only
                # its single-hop arm (the zero arm adds no TPs)
                and len(tps)
                == (1 if p.closure_specs[0][3] == "?" else n_expansion)
            )
            # 'p|q' route: the WHERE is exactly one quantifier-free
            # multi-arm path — answered as the union of its arm chains
            alt_ok = (
                _path_route_ok
                and not p.closure_specs
                and len(p.alt_specs) == 1
                and len(tps) == sum(len(a) for a in p.alt_specs[0][1])
            )
        arms = p.union_arms
        union_ok = bool(arms) and not p.complex and not spans
        if union_ok:
            armed = set()
            for s, e, _ in arms:
                armed.update(range(s, e))
            union_ok = (
                armed == set(range(len(tps)))
                and all(e > s for s, e, _ in arms)
            )
        unions = tuple((tuple(tps[s:e]), fx) for s, e, fx in arms)
        return ParseResult(
            True, form, tps, simple, None,
            select_vars=p.select_vars if form == "SELECT" else None,
            distinct=p.select_distinct,
            evaluable=(
                (
                    form in ("SELECT", "ASK", "CONSTRUCT")
                    and bool(tps)
                    # DESCRIBE: explicit IRIs need no WHERE; vars/'*' do
                    or form == "DESCRIBE"
                    and (p.describe_terms or p.describe_star)
                    and (
                        bool(tps)
                        or not (
                            p.describe_star
                            or any(t.kind == VAR for t in p.describe_terms)
                        )
                    )
                )
                and not p.complex
                and not p.multi_arm
                and (not spans or opt_ok)
                and (not arms or union_ok)
                or closure_ok  # quantified paths override multi_arm
                or alt_ok  # 'p|q' alternatives likewise
            ),
            closure=p.closure_specs[0] if closure_ok else None,
            path_alt=p.alt_specs[0] if alt_ok else None,
            template=p.template if form == "CONSTRUCT" else None,
            filters=tuple(p.filters),
            optionals=optionals,
            base_tps=base,
            unions=unions,
            values=vals,
            describe_terms=tuple(p.describe_terms),
            describe_star=p.describe_star,
            minuses=minuses,
            binds=tuple(p.binds),
            exists=exists_filters,
            order_by=tuple(p.order_by),
            limit=p.limit,
            offset=p.offset,
            group_by=tuple(p.group_by),
            aggregates=tuple(p.aggregates),
        )
    except ParseError as e:
        return ParseResult(False, None, [], True, str(e))
    except RecursionError:
        return ParseResult(False, None, [], True, "[nesting] nesting too deep")
    except Exception as e:  # contract: NEVER raise — any defect in this module
        # must degrade to a counted reject, not fail the Spark stage
        return ParseResult(False, None, [], True, f"[internal] {type(e).__name__}: {e}")
