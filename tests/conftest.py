from __future__ import annotations

import pytest

from flox_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("flox_spark_tests", cpus=4)
    yield s
    # keep the JVM alive across the whole pytest session; stop at exit
    s.stop()
