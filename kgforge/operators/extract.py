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

import os
import uuid
from collections import OrderedDict
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


class _ByteLRU:
    """Byte-budgeted LRU memoization for parse results (VERDICT r3 item 8).

    The previous ``lru_cache(maxsize=200_000)`` bounded ENTRIES, not bytes:
    200k entries of full TP tuples from a high-distinct-query corpus could
    hold multi-GiB in each of the (up to cores-many) Python workers.  This
    cache charges each entry an estimated byte cost (key + canonical + TP
    strings + container overhead) and evicts least-recently-used entries
    past the budget, so worker RSS from memoization is bounded regardless
    of query-string cardinality.  Default budget 64 MiB per worker process
    (~60k typical entries), overridable via KGFORGE_PARSE_CACHE_BYTES."""

    def __init__(self, max_bytes: int):
        self._d: "OrderedDict[str, Tuple[Tuple, int]]" = OrderedDict()
        self.max_bytes = max_bytes
        self.bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> Optional[Tuple]:
        try:
            value, _ = self._d[key]
        except KeyError:
            self.misses += 1
            return None
        self._d.move_to_end(key)
        self.hits += 1
        return value

    def put(self, key: str, value: Tuple, cost: int) -> None:
        if cost > self.max_bytes or key in self._d:
            return
        self._d[key] = (value, cost)
        self.bytes += cost
        while self.bytes > self.max_bytes:
            _, (_, c) = self._d.popitem(last=False)
            self.bytes -= c

    def __len__(self) -> int:
        return len(self._d)


def _entry_cost(raw: str, res: Tuple) -> int:
    """Rough per-entry byte estimate: key + canonical strings at 2 B/char
    (CPython compact strings are 1-4 B/char) + per-TP dict/str overheads."""
    c = 120 + 2 * len(raw)
    canonical = res[6]
    if canonical:
        c += 2 * len(canonical)
    for tp in res[7]:
        c += 200
        for v in tp.values():
            if isinstance(v, str):
                c += 60 + len(v)
    return c


_PARSE_CACHE = _ByteLRU(int(os.environ.get("KGFORGE_PARSE_CACHE_BYTES", str(64 << 20))))


def _parse_one(raw: str) -> Tuple:
    """Fused U2+U3 on one distinct query text.  Returns the full output tuple
    minus provenance; memoized (byte-budgeted LRU, see _ByteLRU) because real
    corpora repeat query strings."""
    cached = _PARSE_CACHE.get(raw)
    if cached is not None:
        return cached
    res = _parse_one_uncached(raw)
    _PARSE_CACHE.put(raw, res, _entry_cost(raw, res))
    return res


def _parse_one_uncached(raw: str) -> Tuple:
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


SINK_SUMMARY_SCHEMA = (
    "task_id int, kg_pid int, n_rows long, fp long, skipped boolean"
)


def _fp60(sha_hex: str) -> int:
    """Leading 60 bits of a content sha as int — the Python twin of the JVM
    fingerprint expr conv(substring(content_sha256, 1, 15), 16, 10)
    (kgforge.checkpoint.sha_fingerprint_col); XOR-aggregated per pid it is
    order-insensitive, so sink-side and scan-side fingerprints agree."""
    return int(sha_hex[:15], 16)


def _parsed_arrow_schema():
    """Arrow schema for the task-committed parsed files — field-for-field the
    layout Spark itself writes for PARSED_SCHEMA + kg_pid + kg_attempt, so
    spark.read.parquet unifies old and new files."""
    import pyarrow as pa

    tp_struct = pa.struct(
        [
            (f, pa.string())
            for f in (
                "s_r", "p_r", "o_r", "s_kind", "p_kind", "o_kind",
                "s_surface", "o_surface", "exp_etype",
            )
        ]
    )
    return pa.schema(
        [
            ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
            ("content_sha256", pa.string()), ("kind", pa.string()),
            ("span_start", pa.int32()), ("span_end", pa.int32()),
            ("parse_ok", pa.bool_()), ("error", pa.string()),
            ("query_form", pa.string()), ("simple", pa.bool_()),
            ("n_tps", pa.int32()), ("bgp_hash", pa.string()),
            ("canonical", pa.string()), ("tps", pa.list_(tp_struct)),
            ("kg_pid", pa.int32()), ("kg_attempt", pa.string()),
        ]
    )


def extract_parse_sink(
    df: DataFrame, out_dir: str, attempt: str, fresh: bool = False
) -> DataFrame:
    """U1+U2+U3 fused WITH the parquet sink inside the same Python stage:
    parsed rows never re-cross the Arrow boundary to the JVM — each task
    builds its own arrow table and writes ONE parquet file, committed by
    atomic rename (the final filename IS the commit marker).  Returns a
    summary DataFrame — one tiny row per (task, pid) with the pid's row
    count and XOR sha-fingerprint — whose collection is the action.  The
    summaries replace the post-write checkpoint-stats scan entirely: the
    per-pid (n_out, fingerprint) the checkpoint store needs aggregates from
    them driver-side (dict-sized: <= tasks x pids-per-task rows).  A skipped
    (already-committed) task reads back just the (kg_pid, content_sha256)
    columns of its own file to reproduce its stats — still no parse.

    Two properties this buys at cluster scale:

    * PER-TASK RESUME (VERDICT r2 item 6): a crashed stage-1 attempt keeps
      every task file that finished renaming; re-running the SAME attempt id
      sees the committed filename and skips the task WITHOUT pulling its
      input — the upstream scan+parse for that split never executes (the
      generator returns before consuming its input iterator).  Filenames
      carry a plan fingerprint over the input schema AND THE SPLIT COUNT
      (review finding: schema alone let a same-attempt rerun under a
      different parallelism/maxPartitionBytes reuse task files covering the
      WRONG input rows — task N of a 16-split plan is not task N of a
      32-split plan).  A rerun whose fingerprint differs purges the stale
      attempt's files up front and re-parses cleanly (no double rows);
      ``fresh=True`` (resume=False) purges even matching files so the
      attempt genuinely recomputes.  Cross-attempt resume remains pid-level
      via the checkpoint anti-join.
    * JVM BYTE SHRINK: the JVM no longer receives, shuffles, or
      parquet-encodes the mention-level rows (structs + 64-char shas);
      encoding happens in the Arrow C++ layer of the Python worker.

    COMMIT-PROTOCOL PORTABILITY (ADVICE r3): driver-side purge and task-side
    rename-commit both target the same ``out_dir``, which requires a SHARED
    FILESYSTEM with atomic rename — local mode or POSIX/NFS scratch (what
    this sandbox runs), or HDFS via a registered backend.  All file ops
    route through kgforge/fsio.py so that requirement is explicit and
    pluggable; on object stores (no atomic rename) the correct production
    path is the Iceberg catalog seam (kgforge/catalog.py), whose
    appendFiles/overwrite transactions replace this protocol entirely."""
    import hashlib as _hl

    from kgforge.fsio import get_fs

    fs = get_fs(out_dir)
    in_cols = ["repo", "path", "commit", "content_sha256", "kg_pid", "content"]
    selected = df.select(*in_cols)
    # split count of the stage that will run the sink: file-scan splits pass
    # through the broadcast anti-join unchanged, so the pre-AQE rdd count
    # matches execution (no job is triggered — planning only)
    n_splits = selected.rdd.getNumPartitions()
    fp = _hl.md5(
        (",".join(selected.schema.names) + f"|{n_splits}").encode()
    ).hexdigest()[:8]
    if fs.isdir(out_dir):
        me = f"task-{attempt}-{fp}-"
        for f in fs.listdir(out_dir):
            if f.startswith(f"task-{attempt}-") and (
                fresh or not f.startswith(me)
            ):
                fs.remove(os.path.join(out_dir, f))  # stale plan or fresh run

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        tid = TaskContext.get().partitionId()
        fs.makedirs(out_dir)
        final = os.path.join(out_dir, f"task-{attempt}-{fp}-{tid:05d}.parquet")
        if fs.exists(final):
            # committed by an earlier run of this attempt: returning without
            # consuming `batches` means the upstream scan+parse never runs.
            # Reproduce the task's per-pid stats from its own file (pruned
            # two-column read, no parse).
            import pyarrow.parquet as _pq

            tbl = _pq.read_table(final, columns=["kg_pid", "content_sha256"])
            stats: dict = {}
            for p_, s_ in zip(
                tbl.column("kg_pid").to_pylist(),
                tbl.column("content_sha256").to_pylist(),
            ):
                st = stats.setdefault(p_, [0, 0])
                st[0] += 1
                st[1] ^= _fp60(s_)
            out = [(tid, p_, st[0], st[1], True) for p_, st in stats.items()]
            if not out:
                out = [(tid, -1, 0, 0, True)]
            yield pd.DataFrame(
                out, columns=["task_id", "kg_pid", "n_rows", "fp", "skipped"]
            )
            return
        schema = _parsed_arrow_schema()
        # hidden tmp name: Spark/pyarrow listings ignore dot-files, so a
        # crashed partial write can never be read as a corrupt parquet
        tmp = os.path.join(
            out_dir, f".task-{attempt}-{fp}-{tid:05d}.tmp-{uuid.uuid4().hex[:8]}"
        )
        writer = None
        n_out = 0
        pid_stats: dict = {}
        rows: list = []
        # buffer across Arrow batches: one row group per input batch (10k
        # rows) measurably slowed every downstream scan; flush at ~64k rows
        # keeps row groups scan-friendly while bounding worker memory
        flush_rows = 65536

        def flush():
            nonlocal writer, n_out, rows
            cols = list(zip(*rows))
            tbl = pa.table(
                {name: list(col) for name, col in zip(schema.names, cols)},
                schema=schema,
            )
            if writer is None:
                writer = pq.ParquetWriter(tmp, schema)
            writer.write_table(tbl)
            n_out += tbl.num_rows
            rows = []

        try:
            for pdf in batches:
                mention_lists = detect_mentions_batch(pdf["content"])
                repo = pdf["repo"].to_numpy()
                path = pdf["path"].to_numpy()
                commit = pdf["commit"].to_numpy()
                sha = pdf["content_sha256"].to_numpy()
                pid = pdf["kg_pid"].to_numpy()
                for row_pos, mentions in enumerate(mention_lists):
                    if not mentions:
                        continue
                    prov = (repo[row_pos], path[row_pos], commit[row_pos], sha[row_pos])
                    p_ = int(pid[row_pos])
                    st = pid_stats.setdefault(p_, [0, 0])
                    f60 = _fp60(sha[row_pos])
                    for m in mentions:
                        rows.append(
                            prov
                            + (m.kind, m.span_start, m.span_end)
                            + _parse_one(m.raw)
                            + (p_, attempt)
                        )
                        st[0] += 1
                        st[1] ^= f60
                if len(rows) >= flush_rows:
                    flush()
            if rows:
                flush()
            if writer is None:
                # empty task still commits a (zero-row) file so a resume
                # skips the split instead of re-scanning it
                pq.write_table(schema.empty_table(), tmp)
            else:
                writer.close()
                writer = None
            fs.replace(tmp, final)
        finally:
            if writer is not None:
                writer.close()
            if fs.exists(tmp):
                fs.remove(tmp)
        out = [(tid, p_, st[0], st[1], False) for p_, st in pid_stats.items()]
        if not out:
            out = [(tid, -1, 0, 0, False)]  # empty task: still one marker row
        yield pd.DataFrame(
            out, columns=["task_id", "kg_pid", "n_rows", "fp", "skipped"]
        )

    return df.select(*in_cols).mapInPandas(gen, schema=SINK_SUMMARY_SCHEMA)


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
