"""Incremental graph MERGE (triples.merge_graph): batch upsert into the
partitioned graph table must sum src_count, union+cap lineage, insert new
triples, and physically touch ONLY the pred_family partitions present in
the batch."""

import glob
import os

from pyspark.sql import functions as F

from kgforge.operators.triples import graph_triples, merge_graph, write_graph

GRAPH_SCHEMA = (
    "subj string, pred string, obj string, src_count long, "
    "lineage array<struct<repo:string,path:string,commit:string,content_sha256:string>>"
)

P_DBO = "<http://dbpedia.org/ontology/birthPlace>"
P_FOAF = "<http://xmlns.com/foaf/0.1/name>"


def _batch(spark, rows):
    return spark.createDataFrame(rows, GRAPH_SCHEMA)


def _lin(*tags):
    return [(f"r{t}", f"p{t}", f"c{t}", f"sha{t}") for t in tags]


def test_merge_sums_counts_unions_lineage_inserts_new(spark, tmp_path):
    path = str(tmp_path / "graph")
    b1 = _batch(spark, [
        ("<s1>", P_DBO, "<o1>", 2, _lin(1, 2)),
        ("<s2>", P_DBO, "<o2>", 1, _lin(3)),
        ("<s3>", P_FOAF, '"alice"', 1, _lin(4)),
    ])
    write_graph(b1, path)
    b2 = _batch(spark, [
        ("<s1>", P_DBO, "<o1>", 3, _lin(2, 5)),   # overlap: counts sum, lineage unions
        ("<s9>", P_DBO, "<o9>", 1, _lin(6)),       # new triple, existing family
    ])
    merge_graph(spark, b2, path)
    out = {
        (r.subj, r.pred, r.obj): r
        for r in spark.read.parquet(path).collect()
    }
    assert len(out) == 4
    merged = out[("<s1>", P_DBO, "<o1>")]
    assert merged.src_count == 5
    assert sorted(x.content_sha256 for x in merged.lineage) == ["sha1", "sha2", "sha5"]
    assert out[("<s9>", P_DBO, "<o9>")].src_count == 1
    assert out[("<s3>", P_FOAF, '"alice"')].src_count == 1  # untouched family survives


def test_merge_prunes_untouched_partitions(spark, tmp_path):
    path = str(tmp_path / "graph")
    write_graph(
        _batch(spark, [
            ("<s1>", P_DBO, "<o1>", 1, _lin(1)),
            ("<s3>", P_FOAF, '"alice"', 1, _lin(2)),
        ]),
        path,
    )
    foaf_dir = glob.glob(os.path.join(path, "pred_family=*foaf*"))[0]
    before = sorted(os.listdir(foaf_dir))
    merge_graph(spark, _batch(spark, [("<s2>", P_DBO, "<o2>", 1, _lin(3))]), path)
    # the foaf partition's files are byte-identical (never rewritten)
    assert sorted(os.listdir(foaf_dir)) == before
    assert spark.read.parquet(path).count() == 3


def test_merge_preserves_non_scheme_predicates(spark, tmp_path):
    """Predicates without a scheme://host namespace (urn:, mailto:) must
    land in a REAL 'other' partition — never the Hive default partition,
    whose NULL read-back made them invisible to the merge's family filter
    while the dynamic overwrite still replaced them (reproduced data loss)."""
    path = str(tmp_path / "graph")
    write_graph(
        _batch(spark, [("<s1>", "<urn:uuid:abc>", "<o1>", 1, _lin(1))]), path
    )
    assert not glob.glob(os.path.join(path, "*HIVE_DEFAULT*"))
    assert glob.glob(os.path.join(path, "pred_family=other"))
    merge_graph(spark, _batch(spark, [("<s2>", "<mailto:x@y>", "<o2>", 1, _lin(2))]), path)
    out = {(r.subj, r.pred) for r in spark.read.parquet(path).collect()}
    assert out == {("<s1>", "<urn:uuid:abc>"), ("<s2>", "<mailto:x@y>")}
    # merging the same family again still upserts, never deletes
    merge_graph(spark, _batch(spark, [("<s1>", "<urn:uuid:abc>", "<o1>", 2, _lin(3))]), path)
    rows = {(r.subj, r.pred): r.src_count for r in spark.read.parquet(path).collect()}
    assert rows[("<s1>", "<urn:uuid:abc>")] == 3
    assert rows[("<s2>", "<mailto:x@y>")] == 1


def test_merge_into_empty_dir_is_initial_write(spark, tmp_path):
    path = str(tmp_path / "graph")
    merge_graph(spark, _batch(spark, [("<s1>", P_DBO, "<o1>", 1, _lin(1))]), path)
    assert spark.read.parquet(path).count() == 1


def test_merge_composes_with_graph_triples_output(spark, tmp_path):
    """merge_graph consumes exactly what graph_triples emits."""
    path = str(tmp_path / "graph")
    linked = spark.createDataFrame(
        [
            ("r", "p", "c", "sha_a", "<s1>", P_DBO, "<o1>", "iri", "iri", "iri"),
            ("r", "p", "c", "sha_b", "<s1>", P_DBO, "<o1>", "iri", "iri", "iri"),
        ],
        "repo string, path string, commit string, content_sha256 string, "
        "subj string, pred string, obj string, s_kind string, p_kind string, o_kind string",
    )
    g = graph_triples(linked)
    write_graph(g, path)
    merge_graph(spark, g, path)
    row = spark.read.parquet(path).collect()[0]
    assert row.src_count == 4  # 2 initial + 2 merged
    assert len(row.lineage) == 2
