"""BE4DBPedia-style canonical BGP labeling.

Normative semantics [B:6]: "deterministic variable renaming + hash-based
pattern canonicalization" — structurally identical BGPs (same pattern up to
variable/bnode renaming and triple-pattern order) must collapse to the same
canonical string and hash; structurally different BGPs must not
(reconstructed intent [R:bgp.py, conf=high]; FIXTURES.md items 7-8).

Canonical form (ours — the reference's exact sort key is unknown,
SURVEY.md 2.9 U3):

    the lexicographically SMALLEST '\n'.join(sorted(rendered TPs))
    over all bijections  vars -> {?v0..?v(k-1)},  bnodes -> {_:cb0..}

This definition is trivially invariant under input variable renaming and TP
permutation (the min ranges over all renamings; sorting kills order), and is
simple enough that the test suite re-implements it as an independent
straight-line oracle (FIXTURES.md section 4).

Cost model at 10^12-file scale: real SPARQL BGPs have <= ~5 variables, so the
exact search is <= 120 serializations of a handful of lines; above
_MAX_EXACT renameables we fall back to a deterministic greedy labeling
(masked-sort first-occurrence naming iterated to fixpoint).  The whole
parse+canonicalize path is additionally memoized per distinct query text
(kgforge.operators.parse), which at corpus scale collapses the hot path to a
dictionary probe — the distinct-before-expensive trick of SURVEY.md 4.3.2.

Pure Python, no Spark imports: runs inside the fused parse+canonicalize
pandas UDF (SURVEY.md 4.3 item 3).
"""

from __future__ import annotations

import hashlib
from itertools import permutations
from typing import Dict, List, Sequence, Tuple

from kgforge.sparql.terms import BNODE, VAR, TriplePattern, render_tp

_MAX_EXACT = 7  # renameable-node cap for the exact min-serialization search


def _renameables(tps: Sequence[TriplePattern]) -> Tuple[List[str], List[str]]:
    """Distinct var names and bnode labels in deterministic (first-occurrence)
    order — the order is irrelevant to the exact search result, it only seeds
    iteration."""
    vs: List[str] = []
    bs: List[str] = []
    seen = set()
    for tp in tps:
        for t in (tp.s, tp.p, tp.o):
            if t.kind == VAR and t.value not in seen:
                seen.add(t.value)
                vs.append(t.value)
            elif t.kind == BNODE and ("_:" + t.value) not in seen:
                seen.add("_:" + t.value)
                bs.append(t.value)
    return vs, bs


def _serialize(tps: Sequence[TriplePattern], names: Dict[str, str]) -> str:
    return "\n".join(sorted(render_tp(tp, names) for tp in tps))


def _exact_min(
    tps: Sequence[TriplePattern], vs: List[str], bs: List[str]
) -> Tuple[str, Dict[str, str]]:
    best: str | None = None
    best_names: Dict[str, str] = {}
    var_perms = permutations(range(len(vs))) if vs else [()]
    for vperm in var_perms:
        vnames = {vs[src]: f"v{dst}" for dst, src in enumerate(vperm)}
        bnode_perms = permutations(range(len(bs))) if bs else [()]
        for bperm in bnode_perms:
            names = dict(vnames)
            for dst, src in enumerate(bperm):
                names["_:" + bs[src]] = f"cb{dst}"
            s = _serialize(tps, names)
            if best is None or s < best:
                best, best_names = s, names
    assert best is not None
    return best, best_names


def _greedy(
    tps: Sequence[TriplePattern], vs: List[str], bs: List[str]
) -> Tuple[str, Dict[str, str]]:
    """Fallback for >_MAX_EXACT renameables: sort TPs by masked rendering
    (unnamed renameables render as '?'), assign names in first-occurrence
    order over the sorted list, re-sort, iterate to fixpoint.  Deterministic;
    invariant under renaming; invariant under permutation except for exotic
    automorphic patterns beyond the exact cap."""
    names: Dict[str, str] = {}
    for _ in range(len(tps) + 2):
        order = sorted(range(len(tps)), key=lambda i: render_tp(tps[i], names))
        new: Dict[str, str] = {}
        vi = bi = 0
        for i in order:
            for t in (tps[i].s, tps[i].p, tps[i].o):
                if t.kind == VAR and t.value not in new:
                    new[t.value] = f"v{vi}"
                    vi += 1
                elif t.kind == BNODE and ("_:" + t.value) not in new:
                    new["_:" + t.value] = f"cb{bi}"
                    bi += 1
        if new == names:
            break
        names = new
    return _serialize(tps, names), names


def canonicalize_with_names(
    tps: Sequence[TriplePattern],
) -> Tuple[str, Dict[str, str]]:
    """(canonical serialization, winning original-name -> canonical-name map).
    The names map keys vars by bare name and bnodes by '_:label' (matching
    render_term's lookup)."""
    if not tps:
        return "", {}
    vs, bs = _renameables(tps)
    if not vs and not bs:
        return _serialize(tps, {}), {}
    if len(vs) <= _MAX_EXACT and len(bs) <= 3:
        return _exact_min(tps, vs, bs)
    return _greedy(tps, vs, bs)


def canonicalize_bgp(tps: Sequence[TriplePattern]) -> str:
    """Canonical serialization: one rendered TP per line, sorted; variables
    renamed ?v0,?v1,... and bnodes _:cb0,... minimizing the serialization."""
    return canonicalize_with_names(tps)[0]


def bgp_hash(canonical: str) -> str:
    return hashlib.sha256(canonical.encode("utf-8")).hexdigest()
