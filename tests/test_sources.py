"""S1 raw-log reader and S3 XML export tests."""

import glob
import os
from urllib.parse import quote_plus

from kgforge.sources.logs import read_apache_log
from kgforge.sources.xml_export import export_entries_xml

Q = "SELECT ?s WHERE { ?s ?p ?o }"


def test_read_apache_log(spark, tmpdir_path):
    log_path = os.path.join(tmpdir_path, "access.log")
    lines = [
        f'10.0.0.1 - - [15/Aug/2026:10:00:07 +0200] "GET /sparql?query={quote_plus(Q)}&format=json HTTP/1.1" 200 1234 "-" "agent"',
        '10.0.0.2 - - [15/Aug/2026:10:00:08 +0200] "GET /page HTTP/1.1" 404 0 "-" "agent"',
        "malformed line without structure",
    ]
    with open(log_path, "w") as f:
        f.write("\n".join(lines))
    rows = read_apache_log(spark, log_path).orderBy("raw_line").collect()
    by_ip = {r.ip: r for r in rows}
    assert by_ip["10.0.0.1"].query == Q  # decoded round-trip
    assert by_ip["10.0.0.1"].status == 200
    assert by_ip["10.0.0.2"].query is None
    assert None in by_ip  # malformed kept with null fields, not dropped
    assert str(by_ip["10.0.0.1"].ts).startswith("2026-08-15 08:00:07")  # UTC


def test_xml_export_roundtrip(spark, tmpdir_path):
    from kgforge.corpus import generate_rows
    from kgforge.operators.extract import extract_parse_df, prefilter, with_content_sha

    src = spark.createDataFrame(generate_rows(60)[0])
    parsed = extract_parse_df(prefilter(with_content_sha(src)))
    out = os.path.join(tmpdir_path, "xml")
    n = export_entries_xml(parsed, out)
    assert n > 0
    files = glob.glob(f"{out}/be4dbp-*.xml")
    assert files
    import xml.etree.ElementTree as ET

    total = sum(len(ET.parse(f).getroot().findall("entry")) for f in files)
    assert total == n
    one = ET.parse(files[0]).getroot().find("entry")
    assert one.find("bgp").get("hash")
    assert one.find("provenance").get("sha256")
