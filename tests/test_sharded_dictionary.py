"""ShardedDictionary (scorer.py): term-range shards loaded on demand
must reproduce the full Dictionary's lookup semantics exactly —
including lookups AT shard boundaries, in the gaps BETWEEN shards, and
outside the global term range — and WAND serving over a sharded-dict
reader must be rank-identical to the full-dict reader."""

import numpy as np

from web_search_engine_ray.stages.scorer import (Dictionary, IndexReader,
                                                 ShardedDictionary,
                                                 build_sharded_dictionary,
                                                 wand_topk)


def _sharded(tiny_index, rows_per_shard=48):
    idx, _stats = tiny_index
    manifest = build_sharded_dictionary(idx, rows_per_shard=rows_per_shard)
    return idx, manifest


def test_sharded_covers_every_term_and_len(ray_session, tiny_index):
    idx, manifest = _sharded(tiny_index)
    full = Dictionary.load(idx)
    sd = ShardedDictionary(idx, max_loaded_shards=2)   # force eviction churn
    assert len(manifest["shards"]) > 3                 # actually sharded
    assert len(sd) == len(full) == manifest["n_terms"]
    for t in full.terms:
        assert sd.get(t) == full.get(t)
        assert t in sd


def test_sharded_boundary_and_gap_lookups(ray_session, tiny_index):
    idx, manifest = _sharded(tiny_index)
    full = Dictionary.load(idx)
    sd = ShardedDictionary(idx)
    shards = manifest["shards"]
    # disjoint, sorted shard ranges
    for a, b in zip(shards, shards[1:]):
        assert a["last_term"] < b["first_term"]
    for s in shards:
        # exact boundary terms resolve in the RIGHT shard
        assert sd.get(s["first_term"]) == full.get(s["first_term"])
        assert sd.get(s["last_term"]) == full.get(s["last_term"])
        # a probe just past last_term falls in the inter-shard gap (or
        # past the end) unless it happens to be a real term
        probe = s["last_term"] + "\x7f"
        assert sd.get(probe) == full.get(probe) is None
    assert sd.get("\x01nosuchterm") is None            # before global first
    assert sd.get("zzzzzzzzzzzz~") is None             # after global last
    try:
        sd["\x01nosuchterm"]
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_wand_rank_identical_under_sharded_dict(ray_session, tiny_index):
    idx, _manifest = _sharded(tiny_index)
    from web_search_engine_ray.sources.transcripts import gen_queries
    full_r = IndexReader(idx)
    shard_r = IndexReader(idx, dict_mode="sharded")
    assert isinstance(shard_r.dictionary, ShardedDictionary)
    for q in gen_queries().column("query").to_pylist()[:25]:
        d0, s0 = wand_topk(full_r, q, 10)
        d1, s1 = wand_topk(shard_r, q, 10)
        assert d0.tolist() == d1.tolist()
        assert np.array_equal(s0, s1)
