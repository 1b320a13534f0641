"""CLI (`ray job submit` surface) smoke: gen -> build -> query via
subprocesses (each owns its Ray session, as the CLI contract states)."""

import json
import subprocess
import sys


def _run(args, timeout=240):
    return subprocess.run([sys.executable, "-m", "web_search_engine_ray.cli",
                           "--num-cpus", "4", *args],
                          capture_output=True, text=True, timeout=timeout,
                          cwd="/root/repo")


def test_cli_end_to_end(tmp_path):
    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "res.parquet")

    r = _run(["gen", "--convs", "30", "--out", corpus])
    assert r.returncode == 0, r.stderr[-500:]

    r = _run(["build", "--input", corpus, "--out", idx])
    assert r.returncode == 0, r.stderr[-500:]
    stats = json.loads([ln for ln in r.stdout.splitlines()
                        if ln.startswith("{")][-1])
    assert stats["n_docs"] > 100

    r = _run(["query", "--index", idx, "--queries", "-", "--out", out],
             timeout=240)
    assert r.returncode == 0, r.stderr[-500:]
    # no stdin queries -> zero rows is fine; now with a real query:
    p = subprocess.run(
        [sys.executable, "-m", "web_search_engine_ray.cli", "--num-cpus",
         "4", "query", "--index", idx, "--queries", "-", "--out", out],
        input="t0000 t0123\n", capture_output=True, text=True, timeout=240,
        cwd="/root/repo")
    assert p.returncode == 0, p.stderr[-500:]
    import pyarrow.parquet as pq
    res = pq.read_table(out)
    assert res.num_rows > 0
    assert set(res.column_names) >= {"query_id", "rank", "doc_id", "score",
                                     "conv_id", "turn_idx"}
