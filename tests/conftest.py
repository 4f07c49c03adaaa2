import os

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
    # TEST_CORES lets CI sweep parallelism levels — results must not depend
    # on it (the engine's determinism contract)
    cores = int(os.environ.get("TEST_CORES", "4"))
    s = get_spark(cores=cores, shuffle_partitions=2 * cores, app_name="bioie-tests")
    yield s


@pytest.fixture(scope="session")
def tiny_spec():
    return TINY
