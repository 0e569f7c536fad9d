from __future__ import annotations

import pytest

from deepseek_ocr_api_rs_spark.conf import build_session
from deepseek_ocr_api_rs_spark.fixtures.corpus import make_documents


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    """300-row deterministic fixture corpus as pandas."""
    return make_documents(300)


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """Fixture corpus written to parquet (input_hint schema)."""
    from deepseek_ocr_api_rs_spark.fixtures.corpus import write_documents_parquet

    path = tmp_path_factory.mktemp("corpus") / "documents.parquet"
    write_documents_parquet(str(path), 300)
    return str(path)


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
