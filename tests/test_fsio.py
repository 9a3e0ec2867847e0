"""Filesystem seam (kgforge/fsio.py) + parse-cache edge cases — pure Python,
no Spark session."""

import os

import pytest

from kgforge.fsio import LocalFS, get_fs, register_fs
from kgforge.operators.extract import _ByteLRU


def test_local_fs_roundtrip(tmp_path):
    fs = get_fs(str(tmp_path))
    assert isinstance(fs, LocalFS)
    d = str(tmp_path / "out")
    fs.makedirs(d)
    assert fs.isdir(d)
    tmp = os.path.join(d, ".part.tmp")
    final = os.path.join(d, "part.parquet")
    with open(tmp, "w") as f:
        f.write("x")
    fs.replace(tmp, final)  # atomic rename: tmp gone, final present
    assert not fs.exists(tmp) and fs.exists(final)
    assert fs.listdir(d) == ["part.parquet"]
    fs.remove(final)
    assert fs.listdir(d) == []


def test_unknown_scheme_fails_loudly():
    with pytest.raises(NotImplementedError, match="s3"):
        get_fs("s3://bucket/prefix")


def test_registered_scheme_dispatches():
    class FakeFS(LocalFS):
        scheme = "fake"

    register_fs("fake", FakeFS())
    assert isinstance(get_fs("fake://x/y"), FakeFS)


def test_byte_lru_rejects_oversized_entry():
    c = _ByteLRU(100)
    c.put("k", (1,), cost=101)  # larger than the whole budget: not admitted
    assert len(c) == 0 and c.bytes == 0
    c.put("k", (1,), cost=60)
    c.put("k2", (2,), cost=60)  # evicts k (LRU) to stay <= 100
    assert len(c) == 1 and c.bytes == 60
    assert c.get("k") is None and c.get("k2") == (2,)


def test_byte_lru_moves_hits_to_back():
    c = _ByteLRU(100)
    c.put("a", (1,), 40)
    c.put("b", (2,), 40)
    assert c.get("a") == (1,)  # a is now most-recent
    c.put("c", (3,), 40)  # evicts b, not a
    assert c.get("a") == (1,) and c.get("b") is None and c.get("c") == (3,)
