"""kgforge — a from-scratch, PySpark-native knowledge-graph construction engine.

Re-creates the BGP-extraction semantics of the reference system
(edesmontils/BE4DBPedia: SPARQL queries mined from DBpedia endpoint logs,
parsed into triple patterns, canonicalized by deterministic variable renaming
+ hash canonicalization) as an idiomatic Spark DataFrame pipeline over an
Iceberg/parquet table of source-code repositories
(repo, path, commit, lang, content).

Reference citations use the SURVEY.md convention: the reference tree at
/root/reference was EMPTY at survey time (SURVEY.md section 0), so reference
behavior is reconstructed ([R:<path>]) and the normative spec is
BASELINE.json ([B:<line>]).  No reference code exists to copy.
"""

__version__ = "0.1.0"
