"""SQL function registration: vectorized scalar UDFs + a Spark 4 Python UDTF.

The UDTF is the alternative U1 form SURVEY.md 2.9 U7 sketches — the
mapInPandas operator (kgforge.operators.extract) remains the pipeline hot
path; this surface exists for ad-hoc SQL over source tables:

    SELECT m.kind, m.raw
    FROM source_files, LATERAL kg_detect_mentions(content) AS m

UDF objects are built inside ``register_all`` because pandas_udf/udtf
schema parsing needs an active SparkSession (module import must stay
session-free for executors).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


class _DetectMentionsUDTF:
    """U7: one output row per SPARQL/log mention found in the input text."""

    def eval(self, content: str):
        if not content:
            return
        from kgforge.sparql.mentions import detect_mentions

        for m in detect_mentions(content):
            yield (m.kind, m.span_start, m.span_end, m.raw)


def register_all(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    @F.pandas_udf("string")
    def kg_bgp_hash(queries: pd.Series) -> pd.Series:
        from kgforge.operators.extract import _parse_one

        def one(q):
            if q is None:
                return None
            r = _parse_one(q)
            return r[5] if r[0] else None

        return queries.map(one)

    @F.pandas_udf("boolean")
    def kg_parse_ok(queries: pd.Series) -> pd.Series:
        from kgforge.operators.extract import _parse_one

        return queries.map(lambda q: bool(_parse_one(q)[0]) if q is not None else False)

    spark.udf.register("kg_bgp_hash", kg_bgp_hash)
    spark.udf.register("kg_parse_ok", kg_parse_ok)
    spark.udtf.register(
        "kg_detect_mentions",
        udtf(_DetectMentionsUDTF,
             returnType="kind string, span_start int, span_end int, raw string"),
    )
