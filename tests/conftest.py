from __future__ import annotations

import pytest

from cngi_prototype_spark.session import initialize_framework
from tests.fixtures import make_vis_pdf


@pytest.fixture(scope="session")
def spark():
    s = initialize_framework(cores=4, app_name="cngi_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def vis_df(spark):
    df = spark.createDataFrame(make_vis_pdf())
    df.cache().count()
    return df
