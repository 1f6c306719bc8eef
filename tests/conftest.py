import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from biomedical_ner_spark.session import get_spark

    s = get_spark(
        app_name="bioner-tests", master="local[8]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_small(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


@pytest.fixture(scope="session")
def golden_docs(spark):
    from tests.golden import GOLDEN

    return spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(GOLDEN)],
        "doc_id BIGINT, text STRING",
    )
