import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
# Python workers must import test modules (pickled EnrichmentModule
# subclasses live there).
os.environ["PYTHONPATH"] = (
    "/root/repo:/root/repo/tests:" + os.environ.get("PYTHONPATH", "")
)

from aleph2_contrib_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests")
    yield s


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
