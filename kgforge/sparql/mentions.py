"""Mention detection: find SPARQL queries embedded in source-file content.

Two mention kinds, per the north star [B:6] and the reference's log-mining
behavior ([R:beLib.py] cheap ``'query=' in line`` test + combined-log regex,
SURVEY.md 2.2 P2/P3 and 2.9 U1):

  * ``dbpedia_log``  — Apache combined-log line with ``GET /sparql?query=...``
                       (URL-encoded SPARQL in the query string).
  * ``sparql``       — embedded SPARQL block (docstring / comment / markdown
                       fence): optional PREFIX/BASE prologue + query form +
                       brace-balanced group graph pattern.

Batch entry point ``detect_mentions_batch`` is what the Spark ``mapInArrow``
operator calls once per Arrow record batch: the prefilter runs as vectorized
pandas ``.str`` ops over the whole batch; per-candidate scanning only runs on
rows that passed the prefilter (SURVEY.md 2.9 U1: "regex mention-detect
batched per Arrow record batch, never per-row Python" — the per-row loop
below executes only over regex *hits*, after the C-backed batch prefilter).

Pure Python + pandas; no Spark imports.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple
from urllib.parse import parse_qs, unquote_plus

import pandas as pd

# --- dbpedia log lines --------------------------------------------------------
# Apache combined log format with a /sparql?query= GET, [R:beLib.py, conf=high].
LOG_LINE_RE = re.compile(
    r'^(?P<ip>\S+) \S+ \S+ \[(?P<ts>[^\]]+)\] '
    r'"GET /sparql\?(?P<qs>[^" ]*) HTTP/[0-9.]+" (?P<status>\d+) (?P<size>\S+)',
    re.MULTILINE,
)

# --- embedded SPARQL blocks ----------------------------------------------------
# Start anchor: optional prologue then a query-form keyword.  Keywords are
# case-insensitive in SPARQL; prose false-positives are later rejected by the
# parser (counted rejects), so over-matching here costs only wasted parses.
_PROLOGUE = r"(?:(?:PREFIX\s+[A-Za-z_][\w.-]*:\s*<[^<>\s]*>|BASE\s*<[^<>\s]*>)\s*)*"
BLOCK_START_RE = re.compile(
    _PROLOGUE + r"(?:SELECT|ASK|CONSTRUCT|DESCRIBE)\b",
    re.IGNORECASE,
)
_TRAILER_RE = re.compile(
    r"(?:\s*(?:ORDER\s+BY|GROUP\s+BY|HAVING|LIMIT|OFFSET)\s+[^\n{}]*)*",
    re.IGNORECASE,
)

# Cheap vectorized prefilter (SURVEY.md P2): JVM-side contains() runs before
# the UDF; this is the second, batch-local gate.
_PREFILTER_RE = re.compile(r"/sparql\?|PREFIX\s|SELECT\s|ASK\s|CONSTRUCT\s|DESCRIBE\s", re.IGNORECASE)

_MAX_BLOCK = 20000  # scan cap per candidate block


class Mention(NamedTuple):
    kind: str  # sparql | dbpedia_log
    span_start: int
    span_end: int
    raw: str  # decoded SPARQL query text


def _match_group_end(text: str, open_idx: int) -> int:
    """Index just past the '}' matching text[open_idx]=='{', respecting
    string literals so braces inside quotes don't count.  -1 if unbalanced."""
    depth = 0
    i, n = open_idx, min(len(text), open_idx + _MAX_BLOCK)
    while i < n:
        c = text[i]
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i + 1
        elif c in "\"'":
            q = c
            triple = text[i : i + 3] == q * 3
            i += 3 if triple else 1
            end_tok = q * 3 if triple else q
            while i < n:
                if text[i] == "\\":
                    i += 2
                    continue
                if text.startswith(end_tok, i):
                    i += len(end_tok) - 1
                    break
                i += 1
        i += 1
    return -1


def detect_log_mentions(content: str) -> List[Mention]:
    out: List[Mention] = []
    for m in LOG_LINE_RE.finditer(content):
        qs = m.group("qs")
        try:
            params = parse_qs(qs, keep_blank_values=True)
        except ValueError:
            continue
        queries = params.get("query")
        if not queries:
            # tolerate bare 'query=<enc>' that parse_qs mangles
            m2 = re.search(r"(?:^|&)query=([^&]*)", qs)
            if not m2:
                continue
            queries = [unquote_plus(m2.group(1))]
        out.append(Mention("dbpedia_log", m.start(), m.end(), queries[0]))
    return out


def detect_block_mentions(content: str, exclude_spans: List[tuple] | None = None) -> List[Mention]:
    out: List[Mention] = []
    pos = 0
    excl = exclude_spans or []
    n = len(content)
    while pos < n:
        m = BLOCK_START_RE.search(content, pos)
        if m is None:
            break
        start = m.start()
        if any(s <= start < e for s, e in excl):
            pos = m.end()
            continue
        open_idx = content.find("{", m.end())
        # the '{' must follow closely (projection vars / DESCRIBE targets /
        # WHERE keyword only) or this is prose, not a query
        if open_idx == -1 or open_idx - m.end() > 400 or "\n\n" in content[m.end():open_idx]:
            pos = m.end()
            continue
        end = _match_group_end(content, open_idx)
        if end == -1:
            pos = m.end()
            continue
        # CONSTRUCT { template } WHERE { pattern }: extend across consecutive
        # groups separated only by whitespace / the WHERE keyword.
        while True:
            gap = re.match(r"\s*(?:WHERE\s*)?\{", content[end : end + 80], re.IGNORECASE)
            if gap is None or "{" not in gap.group():
                break
            nxt_open = content.find("{", end)
            nxt_end = _match_group_end(content, nxt_open)
            if nxt_end == -1:
                break
            end = nxt_end
        t = _TRAILER_RE.match(content, end)
        if t and t.end() > end:
            end = t.end()
        out.append(Mention("sparql", start, end, content[start:end]))
        pos = end
    return out


def detect_mentions(content: str) -> List[Mention]:
    logs = detect_log_mentions(content)
    spans = [(m.span_start, m.span_end) for m in logs]
    blocks = detect_block_mentions(content, exclude_spans=spans)
    return sorted(logs + blocks, key=lambda m: m.span_start)


_EMPTY: List[Mention] = []


def detect_mentions_batch(contents: pd.Series) -> List[List[Mention]]:
    """Vectorized batch entry: returns a positionally-aligned list of
    list[Mention].  The prefilter is a single C-backed regex pass over the
    batch; only hit rows enter the Python candidate scanner.  (Plain-list
    assembly: pandas per-cell .at writes measured at ~45% of batch time.)"""
    hit = contents.str.contains(_PREFILTER_RE, na=False).to_numpy()
    vals = contents.to_numpy()
    return [detect_mentions(vals[i]) if hit[i] else _EMPTY for i in range(len(vals))]
