import pytest

from bioie_llm_spark.datagen.corpus import CorpusSpec
from bioie_llm_spark.session import get_spark

TINY = CorpusSpec(
    n_files=60,
    n_prot=60,
    n_genes=40,
    n_pathways=10,
    n_edges=700,
    n_memberships=200,
    n_statements=400,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, shuffle_partitions=8, app_name="bioie-tests")
    yield s


@pytest.fixture(scope="session")
def tiny_spec():
    return TINY
