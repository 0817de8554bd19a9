import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_replication_rust_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def regions():
    from osm_replication_rust_spark.datagen.synth import fixture_regions

    return fixture_regions()


@pytest.fixture(scope="session")
def images_pdf():
    from osm_replication_rust_spark.datagen.synth import gen_images

    return gen_images(2000, seed=42)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
