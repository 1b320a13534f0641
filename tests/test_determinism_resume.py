"""T-DET (byte-identical rebuild) + T-RES (resume from partials) —
SURVEY.md §5.3, BASELINE.json resumability criterion."""

import json
import os
import shutil

import pytest

from web_search_engine_ray.pipelines.build import build_index
from web_search_engine_ray.sources.transcripts import gen_transcripts

N_CONVS = 60


def _bucket_hashes(out: str) -> dict:
    with open(os.path.join(out, "manifest.json")) as f:
        return {b: v["sha256"] for b, v in json.load(f)["buckets"].items()}


@pytest.fixture(scope="module")
def det_index(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("det") / "a")
    build_index(gen_transcripts(N_CONVS), out)
    return out


def test_deterministic_rebuild(det_index, tmp_path_factory):
    """Same corpus + config -> byte-identical segments (spec A.6)."""
    out2 = str(tmp_path_factory.mktemp("det") / "b")
    build_index(gen_transcripts(N_CONVS), out2)
    h1, h2 = _bucket_hashes(det_index), _bucket_hashes(out2)
    assert h1 == h2 and len(h1) > 0


def test_resume_from_partials(det_index, tmp_path_factory):
    """Kill after partials checkpoint -> resume -> identical segments."""
    out2 = str(tmp_path_factory.mktemp("res") / "c")
    build_index(gen_transcripts(N_CONVS), out2)
    ref_hashes = _bucket_hashes(out2)

    # simulate a crash mid-merge: segments gone, manifest truncated
    shutil.rmtree(os.path.join(out2, "segments"))
    shutil.rmtree(os.path.join(out2, "dictionary"))
    os.remove(os.path.join(out2, "stats.json"))
    with open(os.path.join(out2, "manifest.json")) as f:
        man = json.load(f)
    for stage in ("segments", "finalize"):
        man["stages"].pop(stage, None)
    man["buckets"] = {}
    with open(os.path.join(out2, "manifest.json"), "w") as f:
        json.dump(man, f)

    # resume must NOT re-read raw text: poison is impossible to assert
    # directly, but partials stay marked done, so only merge re-runs.
    build_index(gen_transcripts(N_CONVS), out2, resume=True)
    assert _bucket_hashes(out2) == ref_hashes
    assert os.path.exists(os.path.join(out2, "stats.json"))


def test_resume_config_change_rebuilds(det_index, tmp_path_factory):
    """A config change invalidates the manifest (config_hash mismatch)."""
    from web_search_engine_ray.spec import EngineConfig
    out2 = str(tmp_path_factory.mktemp("res") / "d")
    build_index(gen_transcripts(N_CONVS), out2)
    cfg2 = EngineConfig(num_buckets=16)
    build_index(gen_transcripts(N_CONVS), out2, cfg2, resume=True)
    with open(os.path.join(out2, "manifest.json")) as f:
        man = json.load(f)
    assert man["config_hash"] == cfg2.config_hash()
    assert len(man["buckets"]) <= 16


def test_deterministic_across_batchings(tmp_path_factory):
    """Segment bytes are independent of input block layout (and hence of
    worker count / cluster size): the merge re-encodes canonical posting
    lists (stages/encoder.py:encode_partition)."""
    outs = []
    for blocks in (2, 16):
        out = str(tmp_path_factory.mktemp("bat") / f"b{blocks}")
        build_index(gen_transcripts(N_CONVS, override_num_blocks=blocks), out)
        outs.append(_bucket_hashes(out))
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_deterministic_across_merge_strategies(tmp_path_factory):
    """direct raw-task exchange and Dataset HASH_SHUFFLE merge produce
    byte-identical segments (they differ only in transport)."""
    from web_search_engine_ray.spec import EngineConfig
    hashes = []
    for strat in ("direct", "hash_shuffle"):
        out = str(tmp_path_factory.mktemp("strat") / strat)
        build_index(gen_transcripts(N_CONVS), out,
                    EngineConfig(merge_strategy=strat))
        hashes.append(_bucket_hashes(out))
    assert hashes[0] == hashes[1] and len(hashes[0]) > 0


def test_deterministic_without_materialize(tmp_path_factory):
    """Streaming-checkpoint path (materialize_partials=False — the
    extreme-scale configuration) produces identical segments."""
    from web_search_engine_ray.spec import EngineConfig
    out1 = str(tmp_path_factory.mktemp("mat") / "on")
    out2 = str(tmp_path_factory.mktemp("mat") / "off")
    build_index(gen_transcripts(N_CONVS), out1)
    build_index(gen_transcripts(N_CONVS), out2,
                EngineConfig(materialize_partials=False))
    assert _bucket_hashes(out1) == _bucket_hashes(out2)


def test_actor_pool_indexer_form(tmp_path_factory):
    """The BASELINE-mandated actor-pool form of A1 produces identical
    segments to the task form."""
    from web_search_engine_ray.spec import EngineConfig
    out1 = str(tmp_path_factory.mktemp("a1") / "task")
    out2 = str(tmp_path_factory.mktemp("a1") / "actor")
    build_index(gen_transcripts(N_CONVS), out1)
    build_index(gen_transcripts(N_CONVS), out2,
                EngineConfig(indexer_actor_pool=True))
    assert _bucket_hashes(out1) == _bucket_hashes(out2)


def test_distributed_docid_identical_segments(det_index, tmp_path_factory):
    """The distributed docID path (conversation_offsets_ds + hash join)
    must yield byte-identical segments to the broadcast-dict fast path.
    Config fields that don't touch index semantics are excluded from
    bucket-hash comparison via direct manifest hashes."""
    from web_search_engine_ray.spec import EngineConfig
    out2 = str(tmp_path_factory.mktemp("det") / "dist")
    build_index(gen_transcripts(N_CONVS), out2,
                EngineConfig(docid_distributed=True))
    h1, h2 = _bucket_hashes(det_index), _bucket_hashes(out2)
    assert h1 == h2 and len(h1) > 0


def test_distributed_offsets_match_driver_offsets(tmp_path_factory):
    """(conv_id, base) Dataset == driver-side offsets dict, and the
    join-based assignment produces the same (conv, turn) -> doc_id map."""
    import pyarrow as pa
    import ray

    from web_search_engine_ray.stages.indexer import (
        assign_doc_ids_join, conversation_offsets,
        conversation_offsets_ds)

    ds = gen_transcripts(40)
    offsets, n = conversation_offsets(gen_transcripts(40))
    offsets_ds, n2 = conversation_offsets_ds(gen_transcripts(40))
    assert n == n2
    got = pa.concat_tables(
        list(offsets_ds.iter_batches(batch_format="pyarrow"))).to_pandas()
    assert dict(zip(got.conv_id, got.base)) == offsets
    assigned = assign_doc_ids_join(ds, offsets_ds)
    tbl = pa.concat_tables(
        list(assigned.iter_batches(batch_format="pyarrow"))).to_pandas()
    expect = {(c, t): offsets[c] + t
              for c, t in zip(tbl.conv_id, tbl.turn_idx)}
    got_map = dict(zip(zip(tbl.conv_id, tbl.turn_idx), tbl.doc_id))
    assert got_map == expect and len(got_map) == n


def test_distributed_offsets_validation(tmp_path_factory):
    """Non-dense turn_idx must raise in the distributed path too."""
    import pyarrow as pa
    import pytest as _pytest
    import ray

    from web_search_engine_ray.stages.indexer import conversation_offsets_ds
    bad = pa.table({"conv_id": pa.array(["c1", "c1"], pa.string()),
                    "turn_idx": pa.array([0, 2], pa.int32())})
    with _pytest.raises(Exception) as ei:
        ds, _ = conversation_offsets_ds(ray.data.from_arrow(bad))
    assert "dense" in str(ei.value)


def test_overlapped_build_identical_segments(tmp_path_factory):
    """The overlapped fresh-build path (doc_table write || hot terms,
    checkpoint write || merge) is a scheduling-only optimization: same
    segments, same stats, same doc_table rows as the sequential path.
    Overlap requires a parquet-path input, so both builds go through
    write_parquet first."""
    import dataclasses

    import pyarrow.dataset as pads

    from web_search_engine_ray.spec import EngineConfig

    root = tmp_path_factory.mktemp("ovl")
    src = str(root / "corpus")
    gen_transcripts(N_CONVS).write_parquet(src)
    outs, stats = [], []
    for name, cfg in (("o", EngineConfig()),
                      ("s", dataclasses.replace(
                          EngineConfig(), overlap_build_stages=False))):
        out = str(root / name)
        stats.append(build_index(src, out, cfg))
        outs.append(out)
    assert _bucket_hashes(outs[0]) == _bucket_hashes(outs[1])
    for k in ("n_docs", "max_doc_id", "total_tokens", "avgdl", "dl_min"):
        assert stats[0][k] == stats[1][k]
    # overlap marks every stage done, so a resume is a no-op fast path
    t0 = __import__("time").time()
    build_index(src, outs[0], EngineConfig(), resume=True)
    assert __import__("time").time() - t0 < 5
    tbls = [pads.dataset(os.path.join(o, "doc_table"),
                         format="parquet").to_table().sort_by("doc_id")
            for o in outs]
    assert tbls[0].equals(tbls[1])


def test_no_checkpoint_build_identical_and_restarts(tmp_path_factory):
    """checkpoint_partials=False (the fresh-build throughput config)
    must (a) produce byte-identical segments, (b) write NO partials
    checkpoint, and (c) on a simulated crash before segments, a resume
    re-derives partials instead of trying to read the absent
    checkpoint."""
    import dataclasses

    from web_search_engine_ray.spec import EngineConfig

    root = tmp_path_factory.mktemp("nockpt")
    src = str(root / "corpus")
    gen_transcripts(N_CONVS).write_parquet(src)
    ref = str(root / "ref")
    build_index(src, ref, EngineConfig())
    nc = str(root / "nc")
    cfg = dataclasses.replace(EngineConfig(), checkpoint_partials=False)
    build_index(src, nc, cfg)
    assert _bucket_hashes(ref) == _bucket_hashes(nc)
    assert not os.path.exists(os.path.join(nc, "partials"))
    with open(os.path.join(nc, "manifest.json")) as f:
        man = json.load(f)
    assert man["stages"]["partials"]["checkpointed"] is False

    # crash before segments: resume must restart partials, not read a
    # checkpoint that was never written
    shutil.rmtree(os.path.join(nc, "segments"))
    shutil.rmtree(os.path.join(nc, "dictionary"))
    for stage in ("segments", "finalize"):
        man["stages"].pop(stage, None)
    man["buckets"] = {}
    with open(os.path.join(nc, "manifest.json"), "w") as f:
        json.dump(man, f)
    build_index(src, nc, cfg, resume=True)
    assert _bucket_hashes(nc) == _bucket_hashes(ref)
