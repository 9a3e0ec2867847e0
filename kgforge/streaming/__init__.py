"""Structured-Streaming surface (SURVEY.md 2.10 — stretch M6).

The reference is batch-only (nightly log files); the north rule requires
checkpoint resumability, not streaming.  This package adds the thin
incremental mode SURVEY.md sketches: a file-source stream over the
source_files table driven through the same extract stage via foreachBatch,
plus the watermark/windowed-agg and streaming-dedup primitives."""
