"""Extraction operators: sha invariant, prefilter, mention detect, parse+canonicalize.

Maps SURVEY.md rows P2/P7 (JVM-side), U1 (mention detection, Arrow-batched)
and U2+U3 (parse + canonicalize, FUSED into one pandas stage so the
JVM<->Python boundary is crossed once per batch — SURVEY.md 4.3 item 3).

Never per-row Python [B:15]: both Python stages are ``mapInPandas`` — Spark
feeds them one pandas frame per *Arrow record batch*; all module-level
regexes are precompiled and parse results are memoized per distinct query
text (at corpus scale most query strings repeat, so the hot path is a dict
probe — the dedup-before-expensive-work discipline of SURVEY.md 4.1).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from kgforge.corpus import PRED_ETYPE  # predicate -> entity-type config (linking)
from kgforge.sparql.canonical import bgp_hash, canonicalize_with_names
from kgforge.sparql.mentions import detect_mentions_batch
from kgforge.sparql.parser import parse_query
from kgforge.sparql.terms import render_term

def prefilter_expr() -> F.Column:
    """JVM-side cheap prefilter (SURVEY.md P2): runs before any Python stage;
    the rlike covers lowercase keywords the contains() literals would miss."""
    return F.col("content").contains("/sparql?") | F.col("content").rlike(
        r"(?i)\b(SELECT|ASK|CONSTRUCT|DESCRIBE|PREFIX)\b"
    )

MENTION_SCHEMA = (
    "repo string, path string, commit string, content_sha256 string, "
    "kind string, span_start int, span_end int, raw string"
)

PARSED_SCHEMA = (
    "repo string, path string, commit string, content_sha256 string, "
    "kind string, span_start int, span_end int, "
    "parse_ok boolean, error string, query_form string, "
    "simple boolean, n_tps int, bgp_hash string, canonical string, "
    "tps array<struct<"
    "s_r string, p_r string, o_r string, "
    "s_kind string, p_kind string, o_kind string, "
    "s_surface string, o_surface string, exp_etype string>>"
)


def with_content_sha(df: DataFrame) -> DataFrame:
    """P7 row invariant [B:15]: sha256 over UTF-8 content, computed JVM-side
    at ingest and carried through lineage end-to-end."""
    return df.withColumn("content_sha256", F.sha2(F.encode(F.col("content"), "UTF-8"), 256))


def prefilter(df: DataFrame) -> DataFrame:
    """P2: JVM predicate physically upstream of the Python stages so Catalyst
    cannot reorder the cheap test behind the expensive UDF (SURVEY.md 4.1)."""
    return df.filter(prefilter_expr())


def detect_mentions_df(df: DataFrame) -> DataFrame:
    """U1: source rows -> one row per detected mention (Arrow-batched)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mention_lists = detect_mentions_batch(pdf["content"])
            repo = pdf["repo"].to_numpy()
            path = pdf["path"].to_numpy()
            commit = pdf["commit"].to_numpy()
            sha = pdf["content_sha256"].to_numpy()
            rows = []
            for row_pos, mentions in enumerate(mention_lists):
                for m in mentions:
                    rows.append(
                        (repo[row_pos], path[row_pos], commit[row_pos], sha[row_pos],
                         m.kind, m.span_start, m.span_end, m.raw)
                    )
            yield pd.DataFrame(
                rows,
                columns=["repo", "path", "commit", "content_sha256", "kind",
                         "span_start", "span_end", "raw"],
            )

    cols = ["repo", "path", "commit", "content_sha256", "content"]
    return df.select(*cols).mapInPandas(gen, schema=MENTION_SCHEMA)


def _surface_iri(value: str) -> Optional[str]:
    """Normalized linkable surface of an IRI: lowercased local name
    (FIXTURES.md section 3)."""
    local = value.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
    return local.lower() if local else None


def _surface_term(kind: str, value: str, dtype: Optional[str]) -> Optional[str]:
    if kind == "iri":
        return _surface_iri(value)
    if kind == "literal" and not dtype:  # plain (possibly lang-tagged) literals only
        return value.strip().lower() or None
    return None


@lru_cache(maxsize=200_000)
def _parse_one(raw: str) -> Tuple:
    """Fused U2+U3 on one distinct query text.  Returns the full output tuple
    minus provenance; memoized because real corpora repeat query strings."""
    r = parse_query(raw)
    if not r.parse_ok:
        return (False, r.error, None, True, 0, None, None, [])
    canonical, names = canonicalize_with_names(r.tps)
    tps_out: List[dict] = []
    for tp in r.tps:
        s, p, o = tp.s, tp.p, tp.o
        exp_etype = PRED_ETYPE.get(_surface_iri(p.value) or "", None) if p.kind == "iri" else None
        tps_out.append(
            {
                "s_r": render_term(s, names),
                "p_r": render_term(p, names),
                "o_r": render_term(o, names),
                "s_kind": s.kind,
                "p_kind": p.kind,
                "o_kind": o.kind,
                "s_surface": _surface_term(s.kind, s.value, s.dtype),
                "o_surface": _surface_term(o.kind, o.value, o.dtype),
                "exp_etype": exp_etype,
            }
        )
    return (True, None, r.query_form, r.simple, len(r.tps),
            bgp_hash(canonical), canonical, tps_out)


def extract_parse_df(df: DataFrame) -> DataFrame:
    """U1+U2+U3 fully fused: source rows -> parsed BGP rows in ONE Python
    stage (one Arrow crossing; the intermediate mention text never round-trips
    through the JVM).  This is the pipeline's hot path; the separate
    detect_mentions_df / parse_canonicalize_df operators remain for API and
    tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mention_lists = detect_mentions_batch(pdf["content"])
            repo = pdf["repo"].to_numpy()
            path = pdf["path"].to_numpy()
            commit = pdf["commit"].to_numpy()
            sha = pdf["content_sha256"].to_numpy()
            rows = []
            for row_pos, mentions in enumerate(mention_lists):
                if not mentions:
                    continue
                prov = (repo[row_pos], path[row_pos], commit[row_pos], sha[row_pos])
                for m in mentions:
                    rows.append(prov + (m.kind, m.span_start, m.span_end) + _parse_one(m.raw))
            yield pd.DataFrame(
                rows,
                columns=["repo", "path", "commit", "content_sha256", "kind",
                         "span_start", "span_end", "parse_ok", "error", "query_form",
                         "simple", "n_tps", "bgp_hash", "canonical", "tps"],
            )

    cols = ["repo", "path", "commit", "content_sha256", "content"]
    return df.select(*cols).mapInPandas(gen, schema=PARSED_SCHEMA)


def parse_canonicalize_df(mentions: DataFrame) -> DataFrame:
    """U2+U3 fused: mention rows -> parsed+canonicalized BGP rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [_parse_one(raw) for raw in pdf["raw"].tolist()]
            out = pd.DataFrame(
                res,
                columns=["parse_ok", "error", "query_form", "simple",
                         "n_tps", "bgp_hash", "canonical", "tps"],
                index=pdf.index,
            )
            yield pd.concat(
                [
                    pdf[["repo", "path", "commit", "content_sha256", "kind",
                         "span_start", "span_end"]],
                    out,
                ],
                axis=1,
            )

    return mentions.mapInPandas(gen, schema=PARSED_SCHEMA)
