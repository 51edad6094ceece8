from __future__ import annotations

import pytest

from paddleocr_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("paddleocr-spark-tests", cores=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


@pytest.fixture(scope="session")
def documents_pdf(documents):
    return documents.select("doc_id", "text").toPandas()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: whole-corpus differentials (~20 s each)")
