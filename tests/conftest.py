import pytest

from registry_address_matcher_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ram-spark-tests", master="local[4]", shuffle_partitions=4,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture(scope="session")
def registry_fixture(spark):
    from registry_address_matcher_spark.synth import make_registry_pair

    return make_registry_pair(spark, n_base=300, seed=42)
