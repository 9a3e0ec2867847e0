"""S3: legacy XML benchmark export (fixture-diff utility).

The reference emitted per-date ``be4dbp-*.xml`` entry files
([R:beLib.py]).  Our canonical store is columnar (parquet/Iceberg); this
small utility renders a parsed-BGP DataFrame into the reference's XML entry
shape for side-by-side diffing against legacy outputs.  Driver-side by
design — use it on fixture-sized extracts, never on the full corpus (the
columnar tables are the real sink)."""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame


def export_entries_xml(parsed: DataFrame, out_dir: str, max_rows: int = 10_000) -> int:
    """Write one XML file per (repo) with <entry> elements; returns entry count."""
    rows = parsed.filter("parse_ok").limit(max_rows).collect()
    os.makedirs(out_dir, exist_ok=True)
    by_repo: dict = {}
    for r in rows:
        by_repo.setdefault(r.repo.replace("/", "_"), []).append(r)
    n = 0
    for repo, rs in sorted(by_repo.items()):
        root = ET.Element("benchmark")
        for r in rs:
            entry = ET.SubElement(root, "entry")
            ET.SubElement(entry, "provenance", path=r.path, commit=r.commit,
                          sha256=r.content_sha256)
            ET.SubElement(entry, "request", kind=r.kind, form=r.query_form or "",
                          simple=str(r.simple).lower())
            bgp = ET.SubElement(entry, "bgp", hash=r.bgp_hash or "")
            for line in (r.canonical or "").splitlines():
                tp = ET.SubElement(bgp, "tp")
                tp.text = line
            n += 1
        tree = ET.ElementTree(root)
        ET.indent(tree)
        tree.write(os.path.join(out_dir, f"be4dbp-{repo}.xml"),
                   encoding="unicode", xml_declaration=False)
    return n
