from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from state_economics_end_to_end_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


# companion medium-SF fixture (r12 advice #4): tests that need the
# bigger corpus (twin-bridge comparisons) derive it from the same root
# as the smoke dir, overridable like SF_SMOKE
SF_MED = os.environ.get(
    "SPARK_GRAFT_TEST_SF01_DIR",
    str(Path(SF_SMOKE).resolve().parent / "sf0.01"),
)


@pytest.fixture(scope="session")
def sf_dir_01() -> str:
    return SF_MED


@pytest.fixture(scope="session")
def fixture_paths(tmp_path_factory) -> dict[str, str]:
    from .fixtures_gen import generate_all

    return generate_all(tmp_path_factory.mktemp("raw_sources"))
