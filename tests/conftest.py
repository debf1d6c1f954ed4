import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    import ray.data as rd
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    """1k-page FIXTURES corpus (seeded): hot host, dup urls, empty-text rows,
    non-en rows."""
    from ontoray.pages import make_pages_corpus
    return make_pages_corpus(1000, seed=42)


@pytest.fixture(scope="session")
def small_oracle(small_corpus):
    from ontoray.oracle.oracle import oracle_pipeline
    return oracle_pipeline(small_corpus, curate=True)


@pytest.fixture(scope="session")
def small_engine(ray_session, small_corpus):
    import ray.data as rd
    from ontoray.pipelines.kg import run_kg_pipeline
    return run_kg_pipeline(rd.from_arrow(small_corpus), curate_graph=True)
