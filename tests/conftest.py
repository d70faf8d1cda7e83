import pytest

from auto_data_tokenize_spark import datagen
from auto_data_tokenize_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("adt-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir_small():
    """Synthetic transcripts + goldens at smoke scale."""
    return datagen.ensure_sf("sf0.001")


@pytest.fixture(scope="session")
def transcripts_small(spark, sf_dir_small):
    return spark.read.parquet(f"{sf_dir_small}/transcripts.parquet")
