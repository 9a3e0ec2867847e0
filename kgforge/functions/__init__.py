"""SQL-registrable function surface (SURVEY.md U6/U7).

``register_all(spark)`` exposes the KG primitives to plain SQL users:

  kg_bgp_hash(query)        scalar pandas UDF (Arrow-vectorized)
  kg_parse_ok(query)        scalar pandas UDF
  kg_detect_mentions(text)  Python UDTF (Spark 4) — one row per mention
"""

from kgforge.functions.sqlfns import register_all

__all__ = ["register_all"]
