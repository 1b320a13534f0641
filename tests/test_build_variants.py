"""D1 turn dedup, M4 scoped index views, D4 corpus union, per-bucket
resume granularity."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from web_search_engine_ray.pipelines.build import (build_index, dedup_turns,
                                                   filter_turns)
from web_search_engine_ray.sources.transcripts import (gen_transcripts,
                                                       gen_transcripts_table)


def _with_dups() -> pa.Table:
    t = gen_transcripts_table(20)
    dup = t.slice(5, 3).to_pydict()
    import datetime
    dup["ts"] = [x + datetime.timedelta(seconds=1) for x in dup["ts"]]
    dup["text"] = ["SHOULD NOT SURVIVE"] * 3
    return pa.concat_tables([t, pa.Table.from_pydict(dup, schema=t.schema)])


def test_dedup_turns_keeps_first_by_ts(ray_session):
    tbl = _with_dups()
    out = dedup_turns(ray.data.from_arrow(tbl)).to_pandas()
    assert len(out) == tbl.num_rows - 3
    assert not (out["text"] == "SHOULD NOT SURVIVE").any()
    # full build over the deduped corpus succeeds (dense turn_idx restored)
    src = gen_transcripts_table(20).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    got = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got["text"] == src["text"]).all()


def test_build_with_dedup_flag(ray_session, tmp_path):
    tbl = _with_dups()
    stats = build_index(ray.data.from_arrow(tbl), str(tmp_path / "idx"),
                        dedup=True)
    assert stats["n_docs"] == gen_transcripts_table(20).num_rows


def test_scoped_index_view(ray_session, tmp_path):
    """M4/J3: index only non-tool turns; postings must cover exactly them."""
    out = str(tmp_path / "scoped")
    full = gen_transcripts_table(30)
    n_non_tool = sum(1 for r in full.column("role").to_pylist() if r != "tool")
    with pytest.raises(ValueError):
        # filtered turns are no longer dense 0..n-1 -> strict validation
        build_index(gen_transcripts(30), out, filter_expr="role != 'tool'")


def test_scoped_corpus_input(ray_session, tmp_path):
    """Scoping works on corpus-kind inputs (doc_id already assigned)."""
    t = gen_transcripts_table(30).to_pandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    t["doc_id"] = np.arange(len(t), dtype=np.int64)
    ds = ray.data.from_arrow(pa.Table.from_pandas(t, preserve_index=False))
    out = str(tmp_path / "scoped2")
    stats = build_index(ds, out, input_kind="corpus",
                        filter_expr="role != 'tool'")
    n_non_tool = int((t["role"] != "tool").sum())
    assert stats["n_docs"] == n_non_tool
    dt = pq.read_table(f"{out}/doc_table").to_pandas()
    assert (dt["role"] != "tool").all()


def test_corpus_union(ray_session, tmp_path):
    """D4: two corpora unioned then indexed == one big corpus."""
    a = gen_transcripts(15)
    b_tbl = gen_transcripts_table(30).to_pandas()
    b_tbl = b_tbl[~b_tbl["conv_id"].isin(
        gen_transcripts_table(15).column("conv_id").to_pylist())]
    b = ray.data.from_arrow(pa.Table.from_pandas(b_tbl, preserve_index=False))
    stats_u = build_index(a.union(b), str(tmp_path / "u"))
    stats_f = build_index(gen_transcripts(30), str(tmp_path / "f"))
    assert stats_u["n_docs"] == stats_f["n_docs"]
    assert stats_u["total_tokens"] == stats_f["total_tokens"]
    import json
    h = [json.load(open(f"{tmp_path}/{d}/manifest.json"))["buckets"]
         for d in ("u", "f")]
    assert {b_: v["sha256"] for b_, v in h[0].items()} == \
        {b_: v["sha256"] for b_, v in h[1].items()}


def test_per_bucket_resume(ray_session, tmp_path):
    """Resume skips completed buckets (lineage at bucket granularity)."""
    import json
    import os
    out = str(tmp_path / "pb")
    build_index(gen_transcripts(25), out)
    man_path = os.path.join(out, "manifest.json")
    with open(man_path) as f:
        man = json.load(f)
    ref = {b: v["sha256"] for b, v in man["buckets"].items()}
    # simulate crash: half the buckets missing, segments stage incomplete
    done_half = dict(list(man["buckets"].items())[:len(man["buckets"]) // 2])
    lost = set(man["buckets"]) - set(done_half)
    for b in lost:
        os.remove(man["buckets"][b]["path"])
    man["buckets"] = done_half
    for stage in ("segments", "finalize"):
        man["stages"].pop(stage, None)
    with open(man_path, "w") as f:
        json.dump(man, f)
    build_index(gen_transcripts(25), out, resume=True)
    with open(man_path) as f:
        man2 = json.load(f)
    assert {b: v["sha256"] for b, v in man2["buckets"].items()} == ref
    for b in ref:
        assert os.path.exists(man2["buckets"][b]["path"])


def test_empty_corpus(ray_session, tmp_path):
    """Degenerate input: zero conversations builds an empty-but-valid
    index; queries return no rows instead of crashing."""
    import pyarrow as pa
    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "tool": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us"))})
    out = str(tmp_path / "empty")
    stats = build_index(ray.data.from_arrow(empty), out)
    assert stats["n_docs"] == 0 and stats["total_tokens"] == 0
    from web_search_engine_ray.stages.scorer import IndexReader, wand_topk
    reader = IndexReader(out)
    d, s = wand_topk(reader, "anything", 10)
    assert len(d) == 0
