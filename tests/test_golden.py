"""T-E2E goldens (SURVEY.md §5.3): the tiny fixture's segment hashes and
top-k results are pinned in tests/golden/tiny_results.json (generated
from an oracle-verified build).  Catches silent semantic drift across
refactors/rounds — any intentional spec change must regenerate goldens
consciously."""

import json
import os

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "tiny_results.json")


def test_golden_results(tiny_index):
    out, stats = tiny_index
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert stats["n_docs"] == golden["stats"]["n_docs"]
    assert stats["total_tokens"] == golden["stats"]["total_tokens"]
    with open(os.path.join(out, "manifest.json")) as f:
        man = json.load(f)
    got_hashes = {b: v["sha256"] for b, v in man["buckets"].items()}
    assert got_hashes == golden["bucket_sha256"]

    from web_search_engine_ray.pipelines.query import run_queries
    from web_search_engine_ray.sources.transcripts import gen_queries
    res = run_queries(out, gen_queries(), k=golden["k"],
                      mode="wand").to_pandas()
    for qid, want in golden["results"].items():
        grp = res[res["query_id"] == int(qid)]
        assert grp["doc_id"].tolist() == want["doc_ids"], qid
        assert np.allclose(grp["score"].to_numpy(),
                           np.array(want["scores"]), rtol=0, atol=5e-10), qid
