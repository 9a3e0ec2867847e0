"""Independent straight-line oracle (FIXTURES.md section 4).

Computes expected triples for the synthetic corpus WITHOUT the pipeline under
test: triple patterns come from the HAND-WRITTEN pool metadata
(kgforge.corpus.POOL, not the parser), and canonicalization / rendering /
linking are re-implemented here from the written spec as plain loops.  Only
*data* (the pool, the entity dictionary, the PRED_ETYPE config) is shared
with the engine — no engine code paths.
"""

from __future__ import annotations

import hashlib
from itertools import permutations
from typing import Dict, List, Optional, Tuple

from kgforge.corpus import PRED_ETYPE, POOL_BY_ID, entity_dict_rows, generate_rows


# --- independent rendering (spec: kgforge/sparql/terms.py docstring) ---------
def o_render(term, names: Optional[dict] = None) -> str:
    kind, value, dtype, lang = term.kind, term.value, term.dtype, term.lang
    if kind == "var":
        if names is None:
            return "?" + value
        return "?" + names[value] if value in names else "?"
    if kind == "iri":
        return "<" + value + ">"
    if kind == "bnode":
        if names is None:
            return "_:" + value
        key = "_:" + value
        return "_:" + names[key] if key in names else "_:?"
    esc = value.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
    out = '"' + esc + '"'
    if lang:
        out += "@" + lang
    elif dtype:
        out += "^^<" + dtype + ">"
    return out


# --- independent canonicalization (spec: min serialization over bijections) --
def o_canonical(tps) -> Tuple[str, dict]:
    """Brute-force ALL renaming bijections; returns (canonical, winning names)."""
    vs: List[str] = []
    bs: List[str] = []
    for tp in tps:
        for t in (tp.s, tp.p, tp.o):
            if t.kind == "var" and t.value not in vs:
                vs.append(t.value)
            if t.kind == "bnode" and t.value not in bs:
                bs.append(t.value)
    best_s: Optional[str] = None
    best_names: dict = {}
    for vperm in permutations(range(len(vs))) if vs else [()]:
        for bperm in permutations(range(len(bs))) if bs else [()]:
            names = {vs[src]: f"v{dst}" for dst, src in enumerate(vperm)}
            for dst, src in enumerate(bperm):
                names["_:" + bs[src]] = f"cb{dst}"
            lines = sorted(
                " ".join((o_render(tp.s, names), o_render(tp.p, names), o_render(tp.o, names)))
                for tp in tps
            )
            s = "\n".join(lines)
            if best_s is None or s < best_s:
                best_s, best_names = s, names
    return best_s or "", best_names


# --- independent linking (spec: FIXTURES.md section 3 + SURVEY.md U4) --------
_DICT: Dict[str, List[Tuple[str, float, str]]] = {}
for _s, _e, _p, _t in entity_dict_rows():
    _DICT.setdefault(_s, []).append((_e, _p, _t))


def _local(iri: str) -> str:
    return iri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]


def o_link(term, pred, names: dict) -> str:
    rendered = o_render(term, names)
    if term.kind == "iri":
        surface = _local(term.value).lower()
    elif term.kind == "literal" and not term.dtype:
        surface = term.value.strip().lower()
    else:
        return rendered
    cands = _DICT.get(surface)
    if not cands:
        return rendered
    exp = PRED_ETYPE.get(_local(pred.value).lower()) if pred.kind == "iri" else None
    best_id, best_score = None, -1.0
    for eid, prior, etype in cands:
        score = prior * (1.0 if exp is not None and etype == exp else 0.5)
        if score > best_score or (score == best_score and (best_id is None or eid < best_id)):
            best_id, best_score = eid, score
    return best_id or rendered


# --- expected corpus triples ---------------------------------------------------
def expected_triples(n_rows: int) -> set:
    """Set of (subj, pred, obj, content_sha256) over the synthetic corpus."""
    rows, plants = generate_rows(n_rows)
    out = set()
    canon_cache: dict = {}
    for plant in plants:
        q = POOL_BY_ID[plant.qid]
        if q.qid not in canon_cache:
            canon_cache[q.qid] = o_canonical(q.tps)
        _, names = canon_cache[q.qid]
        sha = hashlib.sha256(rows[plant.row]["content"].encode("utf-8")).hexdigest()
        for tp in q.tps:
            subj = o_link(tp.s, tp.p, names)
            pred = o_render(tp.p, names)
            obj = o_link(tp.o, tp.p, names)
            out.add((subj, pred, obj, sha))
    return out
