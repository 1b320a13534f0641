import os
import shutil

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_index(ray_session, tmp_path_factory):
    """Build the tiny fixture corpus index once for the whole session."""
    from web_search_engine_ray.pipelines.build import build_index
    from web_search_engine_ray.sources.transcripts import gen_transcripts

    out = str(tmp_path_factory.mktemp("idx") / "tiny")
    stats = build_index(gen_transcripts(150), out)
    yield out, stats
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="session")
def tiny_corpus_table(ray_session):
    """The same tiny corpus with engine doc_ids, as one arrow table."""
    import numpy as np
    import pyarrow as pa

    from web_search_engine_ray.sources.transcripts import gen_transcripts_table

    tt = gen_transcripts_table(150).to_pandas()
    tt = tt.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    tt["doc_id"] = np.arange(len(tt), dtype=np.int64)
    return pa.Table.from_pandas(tt, preserve_index=False)
