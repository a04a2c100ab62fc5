import pytest

from simhash_text_dedup_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", cores=4, shuffle_partitions=8,
                  extra={"spark.sql.execution.arrow.maxRecordsPerBatch": "2000"})
    yield s
    s.stop()
