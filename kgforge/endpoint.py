"""EP-C parity: endpoint re-execution / emptiness annotation.

The reference's ``-doEmpty`` / ``-doTPFC`` flags re-ran each extracted query
against a DBpedia TPF/SPARQL endpoint over HTTP and annotated entries with
empty/error flags ([R:Endpoint.py], SURVEY.md 3.1 EP-C).  This sandbox has
no network, so the HTTP call sits behind an injectable executor seam; the
Spark-side design is the part that matters at scale:

  * validate each DISTINCT query once (dedup-before-expensive-op,
    SURVEY.md 4.1), then broadcast-join verdicts back to entries;
  * the executor runs inside mapInPandas with a bounded batch, so a real
    endpoint sees one connection pool per task, not one request per row.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# verdict per query text: (empty: bool | None, error: str | None)
QueryExecutor = Callable[[str], tuple]

VALIDATION_SCHEMA = "query string, endpoint_empty boolean, endpoint_error string"


def http_executor(endpoint_url: str) -> QueryExecutor:
    """THE NETWORK SEAM.  Production implementation issues
    ``GET {endpoint_url}?query=<urlencoded>`` with JSON results accept
    header and classifies empty bindings / HTTP errors.  No network exists
    in this sandbox."""

    def run(_query: str) -> tuple:
        raise NotImplementedError(
            f"no network in this sandbox; endpoint {endpoint_url} unreachable — "
            "inject a QueryExecutor (see deterministic_fake_executor)"
        )

    return run


def deterministic_fake_executor(query: str) -> tuple:
    """Sandbox stand-in: deterministic verdict from the query text hash
    (stable across runs, exercises both branches)."""
    import hashlib

    h = int(hashlib.sha256(query.encode()).hexdigest()[:8], 16)
    if h % 13 == 0:
        return (None, "timeout")
    return (h % 3 == 0, None)


def validate_entries(
    entries: DataFrame, executor: QueryExecutor = deterministic_fake_executor
) -> DataFrame:
    """Annotate parsed entries with endpoint verdicts: distinct queries are
    validated once, verdicts broadcast back (O(distinct), not O(entries))."""
    distinct_q = entries.filter("parse_ok").select("query").distinct()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            verdicts = [executor(q) for q in pdf["query"].tolist()]
            yield pd.DataFrame(
                {
                    "query": pdf["query"],
                    "endpoint_empty": [v[0] for v in verdicts],
                    "endpoint_error": [v[1] for v in verdicts],
                }
            )

    verdicts = distinct_q.mapInPandas(gen, schema=VALIDATION_SCHEMA)
    return entries.join(F.broadcast(verdicts), "query", "left")
