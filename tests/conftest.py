import pytest

from tesseract_rs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tesseract-rs-spark-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
