"""Filesystem seam for the task-committed sink's commit protocol.

The stage-1 parse sink (kgforge/operators/extract.py:extract_parse_sink)
commits each task's parquet file by atomic rename and purges stale attempts
by list+remove.  Those five primitives (listdir, remove, makedirs, atomic
replace, exists) were previously raw ``os`` calls, which only work when the
driver and every executor share one POSIX filesystem — true in local mode
and on a shared NFS scratch, NOT on HDFS or object stores (ADVICE r3: plain
``os`` cannot address HDFS at all, and object stores have no atomic rename).

This module makes that contract explicit and pluggable:

* ``LocalFS`` — the POSIX backend (local mode / shared FS).  Rename IS
  atomic here, so the filename-as-commit-marker protocol is sound.
* HDFS — a backend would route through pyarrow.fs.HadoopFileSystem (rename
  is atomic on HDFS, so the same protocol holds); not instantiable in this
  sandbox (no Hadoop native libs) but the seam is where it plugs in.
* Object stores (S3/GCS) — rename is copy+delete, NOT atomic; the correct
  production path is the Iceberg catalog seam (kgforge/catalog.py), whose
  appendFiles/overwrite transactions replace the rename-commit entirely.

``get_fs(path)`` dispatches on the path's scheme; unregistered schemes fail
loudly instead of silently running POSIX calls against a URI.
"""

from __future__ import annotations

import os
from typing import Dict, List


class LocalFS:
    """POSIX-backed primitives; atomic ``replace`` per rename(2)."""

    scheme = "file"

    def listdir(self, d: str) -> List[str]:
        return os.listdir(d)

    def remove(self, p: str) -> None:
        os.remove(p)

    def makedirs(self, p: str) -> None:
        os.makedirs(p, exist_ok=True)

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def exists(self, p: str) -> bool:
        return os.path.exists(p)

    def isdir(self, p: str) -> bool:
        return os.path.isdir(p)

    def rmtree(self, p: str) -> None:
        """Recursive delete, absent-path tolerant — used by the incremental
        dedup state swap (stage/old cleanup) where the path may or may not
        exist depending on where a prior run stopped."""
        import shutil

        shutil.rmtree(p, ignore_errors=True)

    def read_text(self, p: str) -> str:
        """Small-file text read (state markers like the dedup _META.json) —
        routed through the seam so a non-local backend can serve it (round
        6, ADVICE r5: _META.json was the one state-dir IO going around the
        seam, silently pinning the method marker to the local filesystem)."""
        with open(p, encoding="utf-8") as fh:
            return fh.read()

    def write_text(self, p: str, s: str) -> None:
        """Small-file text write via temp + atomic replace (a crash mid-write
        must not leave a torn marker that poisons every later batch)."""
        tmp = p + ".__tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(s)
        os.replace(tmp, p)


_BACKENDS: Dict[str, object] = {"file": LocalFS()}


def register_fs(scheme: str, fs) -> None:
    """Install a backend for a URI scheme (e.g. 'hdfs'); used by deployments
    whose commit protocol targets a non-POSIX store."""
    _BACKENDS[scheme] = fs


def get_fs(path: str):
    scheme = path.split("://", 1)[0] if "://" in path else "file"
    try:
        return _BACKENDS[scheme]
    except KeyError:
        raise NotImplementedError(
            f"no filesystem backend registered for scheme {scheme!r} "
            f"(path {path!r}); register one via kgforge.fsio.register_fs or "
            "use the Iceberg catalog seam (kgforge/catalog.py) whose "
            "transactions replace the rename-commit protocol on object stores"
        )
