import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from kgforge.conf import get_spark

    s = get_spark("kgforge-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="kgforge_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
