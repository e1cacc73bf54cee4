from __future__ import annotations

import os
import shutil

import pytest

from ai_intel_web_scraper_spark.session import get_spark
from ai_intel_web_scraper_spark.synth.generator import WebSpec, generate_fixtures

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
FX_DIR = "/tmp/spark_graft_fixtures"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def webspec():
    return WebSpec(seed=42, n_hosts=20, total_pages=800)


@pytest.fixture(scope="session")
def fixtures(webspec):
    if os.path.exists(FX_DIR):
        shutil.rmtree(FX_DIR)
    return generate_fixtures(webspec, FX_DIR)


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
