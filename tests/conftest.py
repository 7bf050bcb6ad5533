from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jaffle_shop_classic_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("JAFFLE_TEST_SF_DIR", "/root/testdata/sf0.001")
SEED_DIR = os.environ.get("JAFFLE_SEED_DIR", "/root/reference/seeds")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("pytest", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def seed_dir():
    return SEED_DIR
