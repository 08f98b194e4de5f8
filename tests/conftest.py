import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from unstructured_data_pipeline_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="udp-tests", shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
