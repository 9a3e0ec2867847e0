"""S1/P3: raw Apache-combined-log reader.

The reference consumed gzip'd DBpedia endpoint logs line by line
([R:be4dbp.py+beLib.py]).  Spark equivalent: ``spark.read.text`` (gzip
transparent) + JVM-side regexp_extract field parsing — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LOG_PATTERN = (
    r'^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) ([^" ]*) (HTTP/[0-9.]+)" (\d+) (\S+)'
)


def read_apache_log(spark: SparkSession, path: str) -> DataFrame:
    """Log file(s) -> (ip, ts, method, url, status, size, query) rows.
    Lines that do not match are kept with null fields (quarantine-countable,
    mirroring the reference's skip-and-count, [R:Stat.py])."""
    lines = spark.read.text(path)
    c = F.col("value")
    ts_raw = F.regexp_extract(c, LOG_PATTERN, 2)
    df = lines.select(
        F.nullif(F.regexp_extract(c, LOG_PATTERN, 1), F.lit("")).alias("ip"),
        F.to_timestamp(F.nullif(ts_raw, F.lit("")), "dd/MMM/yyyy:HH:mm:ss Z").alias("ts"),
        F.nullif(F.regexp_extract(c, LOG_PATTERN, 3), F.lit("")).alias("method"),
        F.nullif(F.regexp_extract(c, LOG_PATTERN, 4), F.lit("")).alias("url"),
        # ANSI mode (Spark 4 default): ''/'-' -> int throws; try_cast -> NULL
        F.regexp_extract(c, LOG_PATTERN, 6).try_cast("int").alias("status"),
        F.regexp_extract(c, LOG_PATTERN, 7).try_cast("long").alias("size"),
        c.alias("raw_line"),
    )
    # the /sparql?query= param, URL-decoded JVM-side (P4).  try_url_decode:
    # a malformed percent-encoding (query=%ZZ) must become a NULL query (a
    # counted reject), never a CANNOT_DECODE_URL job abort — the module
    # contract is skip-and-count quarantine (ADVICE round 1).
    query_enc = F.regexp_extract(F.col("url"), r"[?&]query=([^&]*)", 1)
    return df.withColumn(
        "query",
        F.when(
            F.col("url").startswith("/sparql") & (query_enc != ""),
            F.try_url_decode(F.regexp_replace(query_enc, r"\+", "%20")),
        ),
    )
