import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from pgspark_index.session import get_spark

    s = get_spark(app="pgspark_index-tests", cores=4, shuffle_partitions=8, driver_memory="6g")
    yield s
    s.stop()


@pytest.fixture()
def tmp_index():
    d = tempfile.mkdtemp(prefix="pgspark_index_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
