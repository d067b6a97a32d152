import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tilers_tools_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def images_smoke(tmp_path_factory):
    """100-row sf-smoke fixture, full spec format cycle raw/png/jpeg
    (FIXTURES.md §1; jpeg via the M7 codec)."""
    from fixtures import gen

    p = str(tmp_path_factory.mktemp("fix") / "images_smoke.parquet")
    gen.write_images_parquet(p, 100, fmts=("raw", "png", "jpeg"))
    return p


@pytest.fixture(scope="session")
def polygons_smoke(tmp_path_factory):
    from fixtures import gen

    p = str(tmp_path_factory.mktemp("fix") / "polygons.parquet")
    gen.write_polygons_parquet(p, 16)
    return p
