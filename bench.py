"""Benchmark driver (BASELINE.md protocol).

Default: runs the headline pipelines once under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf", "num_cpus"}.

--scaling: runs the SAME build+query job in two fresh subprocesses
(num_cpus=8 then 32) over the same pre-generated corpus and reports
throughput at both plus scaling efficiency = (thru_32 / thru_8) / 4
(the sandbox stand-in for the N-vs-4N-node cluster criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_CONVS = int(os.environ.get("WSE_BENCH_CONVS", "60000"))
# The two parallelism levels of the N-vs-4N scaling stand-in.  Default
# 8,32; on windows where the hypervisor delivers fewer than 32
# effective cores (the capacity probe shows 21-26 on this shared VM),
# "4,16" measures ENGINE scaling inside delivered capacity instead of
# hypervisor throttling — record whichever was used in BASELINE.md.
SCALING_LEVELS = tuple(int(x) for x in os.environ.get(
    "WSE_SCALING_LEVELS", "8,32").split(","))
# The scaling criterion needs enough work that the parallel compute
# dominates constant costs (job startup, driver-side offsets/cumsum,
# sidecar writes) at BOTH parallelism levels — a larger corpus.
SCALING_CONVS = int(os.environ.get("WSE_SCALING_CONVS", "300000"))
BENCH_CORPUS = f"/tmp/wse_bench_corpus_{BENCH_CONVS}"
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _init_ray(num_cpus: int):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def ensure_corpus(n_convs: int = BENCH_CONVS) -> str:
    """Generate the deterministic bench corpus once (multi-file parquet)."""
    path = f"/tmp/wse_bench_corpus_{n_convs}"
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    from web_search_engine_ray.sources.transcripts import gen_transcripts
    shutil.rmtree(path, ignore_errors=True)
    gen_transcripts(n_convs, override_num_blocks=64).write_parquet(path)
    with open(done, "w") as f:
        f.write("ok")
    return path


def build_and_query(corpus_path: str, out_dir: str,
                    build_samples: int = 1,
                    with_queries: bool = True) -> dict:
    """The headline job: E1 build + E2 100-query WAND serve.

    build_samples > 1 repeats the E1 build (cold output dir each time)
    and reports the MEDIAN + all samples — this shared VM swings
    identical-input build times 2-3x between windows, so a single shot
    is noise, not a number (BASELINE.md protocol)."""
    import statistics

    import numpy as np

    from web_search_engine_ray.pipelines.build import build_index
    from web_search_engine_ray.pipelines.query import run_queries
    from web_search_engine_ray.sources.transcripts import gen_queries
    from web_search_engine_ray.spec import EngineConfig
    # WSE_CKPT_PARTIALS=0 skips the mid-build partials checkpoint (a
    # corpus-sized extra bus crossing) — the fresh-build throughput
    # config; default 1 keeps the resumable form the driver exercises
    cfg = EngineConfig(checkpoint_partials=os.environ.get(
        "WSE_CKPT_PARTIALS", "1") == "1")
    build_secs = []
    for _ in range(max(1, build_samples)):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        stats = build_index(corpus_path, out_dir, cfg)
        build_secs.append(time.time() - t0)
    build_sec = statistics.median(build_secs)
    n_turns = stats["n_docs"]
    if not with_queries:
        return {"n_turns": n_turns,
                "build_sec": round(build_sec, 3),
                "build_sec_samples": [round(s, 3) for s in build_secs],
                "turns_per_sec": round(n_turns / build_sec, 1)}

    # Latency loop runs the per-query serve form: shared index (plasma,
    # hot terms pre-decoded once at share time) + topk_auto, which fans
    # heavy stopword-class queries out to doc-range shard tasks — the
    # path that owns the p95 tail.  share_index is serve infrastructure
    # (like opening the index), so it sits outside the timed region.
    from web_search_engine_ray.stages.scorer import (IndexReader,
                                                     share_index, topk_auto)
    shared = share_index(out_dir)
    reader = IndexReader(out_dir, shared=shared)
    q = gen_queries()
    lat, warm = [], []
    for query in q.column("query").to_pylist():
        t1 = time.time()
        topk_auto(reader, query, 10, index_dir=out_dir, shared=shared)
        lat.append(time.time() - t1)
    for query in q.column("query").to_pylist():   # caches warm
        t1 = time.time()
        topk_auto(reader, query, 10, index_dir=out_dir, shared=shared)
        warm.append(time.time() - t1)
    # actor-pool serve of the full set (the distributed path; auto mode
    # routes plan-heavy queries through doc-range sharding)
    t2 = time.time()
    run_queries(out_dir, q, k=10, mode="auto")
    serve_sec = time.time() - t2
    return {
        "n_turns": n_turns,
        "build_sec": round(build_sec, 3),
        "build_sec_samples": [round(s, 3) for s in build_secs],
        "turns_per_sec": round(n_turns / build_sec, 1),
        "query_p50_ms": round(float(np.percentile(lat, 50)) * 1000, 3),
        "query_p95_ms": round(float(np.percentile(lat, 95)) * 1000, 3),
        "query_warm_p50_ms": round(float(np.percentile(warm, 50)) * 1000, 3),
        "query_warm_p95_ms": round(float(np.percentile(warm, 95)) * 1000, 3),
        "serve_100_queries_sec": round(serve_sec, 3),
    }


def sf_pipelines(sf_dir: str) -> dict:
    """Per-pipeline wall times over the driver testdata at $GRAFT_SF_DIR."""
    from web_search_engine_ray.pipelines import reference_queries as rq
    out = {}
    # force a cold index build for the documents corpus
    import hashlib
    key = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    shutil.rmtree(f"/tmp/wse_idx_{key}", ignore_errors=True)
    for name in ("bm25_topk", "doc_lengths", "term_df", "dedup_exact",
                 "dedup_minhash", "dedup_simhash", "knn_cosine",
                 "quality_score", "lang_id", "media_features",
                 "events_latest", "events_retention", "emb_dim_stats"):
        t0 = time.time()
        rq.QUERIES[name](sf_dir)
        out[name] = round(time.time() - t0, 3)
    return out


def main_bench() -> None:
    _init_ray(NUM_CPUS)
    corpus = ensure_corpus()
    t_total = time.time()
    headline = build_and_query(
        corpus, "/tmp/wse_bench_idx",
        build_samples=int(os.environ.get("WSE_BENCH_BUILD_SAMPLES", "3")))
    sf_times = sf_pipelines(SF_DIR)
    total = time.time() - t_total
    queries = {**sf_times,
               "index_build_sec": headline["build_sec"],
               "serve_100_queries_sec": headline["serve_100_queries_sec"]}
    print(json.dumps({
        "metric": "index_build_turns_per_sec",
        "value": headline["turns_per_sec"],
        "unit": "turns/sec",
        "headline": headline,
        "queries": queries,
        "total_sec": round(total, 3),
        "sf": SF_DIR,
        "bench_corpus_turns": headline["n_turns"],
        "num_cpus": NUM_CPUS,
    }))
    import ray
    ray.shutdown()


def _scaling_child(num_cpus: int) -> dict:
    """Entry for a fresh-process scaling run (same corpus, fixed cpus).

    Index scratch defaults to tmpfs (WSE_SCRATCH=/dev/shm): the 8-vs-32
    CPU stand-in shares ONE virtual disk across both levels, a
    contention a real N-vs-4N-node cluster does not have (each node
    brings its own disks) — tmpfs isolates the CPU-scaling signal the
    criterion asks about.  Set WSE_SCRATCH=/tmp to measure the
    disk-bound variant; BASELINE.md reports both.
    """
    import shutil as _sh
    _init_ray(num_cpus)
    corpus = ensure_corpus(SCALING_CONVS)
    scratch = os.environ.get("WSE_SCRATCH", "/dev/shm")
    # scaling children measure the FRESH-build job: no mid-build
    # checkpoint unless explicitly requested (one fewer corpus-sized
    # bus crossing; both levels of a window share the same config, and
    # the JSON discloses which was used)
    os.environ.setdefault("WSE_CKPT_PARTIALS", "0")
    out = os.path.join(scratch, f"wse_bench_idx_{num_cpus}")
    # the scaling metric is BUILD throughput; the latency/serve loop is
    # benchmarked by the main bench (WSE_SCALING_QUERIES=1 restores it)
    res = build_and_query(
        corpus, out,
        with_queries=os.environ.get("WSE_SCALING_QUERIES", "0") == "1")
    res["checkpoint_partials"] = os.environ["WSE_CKPT_PARTIALS"] == "1"
    _sh.rmtree(out, ignore_errors=True)
    import ray
    ray.shutdown()
    return res


def _spin_probe(dur: float) -> int:
    end = time.perf_counter() + dur
    n = 0
    while time.perf_counter() < end:
        n += 1
    return n


def _stream_probe(dur: float) -> float:
    """GB/s of memory-copy throughput for one process — the STREAM-like
    complement to the register-only spin probe.  A data engine's build
    is memory-streaming work; on this VM the aggregate copy bandwidth
    saturates at ~40 GB/s by 8 processes (measured 5.8 / 15.4 / 35.8 /
    37.4 / 40.0 GB/s at 1/4/8/16/32 procs), so spin capacity alone
    overstates what any engine can express at wide parallelism."""
    import numpy as np
    a = np.zeros(64 * 1024 * 1024, dtype=np.uint8)
    b = np.empty_like(a)
    n = 0
    end = time.perf_counter() + dur
    while time.perf_counter() < end:
        np.copyto(b, a)
        np.copyto(a, b)
        n += 2
    return n * a.nbytes / dur / 1e9


def _host_capacity_probe(lo: int, hi: int, dur: float = 1.0) -> dict:
    """Probe of DELIVERED host capacity: aggregate spin (CPU) and
    stream (memory-bandwidth) throughput at lo and hi processes, each
    running for ``dur`` seconds.  On this shared VM the hypervisor
    often delivers only ~20-26 effective cores to 32 spinners, and the
    memory bus saturates near 8 streaming processes, so both
    hi/lo capacity ratios (the speedup the lo-vs-hi stand-in can
    physically express; ideal hi/lo) are recorded per window —
    spin gates window acceptance; both normalize efficiency."""
    import concurrent.futures as cf

    def agg(fn, nproc: int) -> float:
        if nproc == 1:
            return fn(dur)
        with cf.ProcessPoolExecutor(max_workers=nproc) as ex:
            return sum(f.result() for f in
                       [ex.submit(fn, dur) for _ in range(nproc)])

    single = agg(_spin_probe, 1)
    s_lo = agg(_spin_probe, lo)
    s_hi = agg(_spin_probe, hi)
    m_lo = agg(_stream_probe, lo)
    m_hi = agg(_stream_probe, hi)
    return {"probe_dur_s": dur,
            "single_spin": single,
            f"spin{lo}_total": s_lo, f"spin{hi}_total": s_hi,
            f"spin{lo}_ratio": round(s_lo / single, 2),
            f"spin{hi}_ratio": round(s_hi / single, 2),
            f"stream{lo}_gbps": round(m_lo, 1),
            f"stream{hi}_gbps": round(m_hi, 1),
            "capacity_hi_over_lo": round(s_hi / s_lo, 3),
            "stream_hi_over_lo": round(m_hi / m_lo, 3)}


def main_scaling() -> None:
    """Round-4 protocol (VERDICT_r03 ask #1) — built to MEASURE scaling
    despite the diagnosed shared-host sustained-load throttling instead
    of re-running into it:

    - FIRST-sample-per-window: each widely-spaced window contributes
      exactly ONE fresh-process pair (the round-3 data shows the first
      sample of an idle window is the honest estimator; later
      back-to-back samples decay monotonically under host throttling).
    - randomized level order per window (seeded): hi-before-lo in half
      the windows controls the decay direction instead of always
      penalizing whichever level runs second.
    - sustained capacity gate: a window is only ACCEPTED if a
      ``WSE_SCALING_PROBE_S``-second (default 6 s/level, 3 levels)
      spin probe shows the host can currently express at least
      ``WSE_SCALING_MIN_CAP`` (default 0.82 * ideal) speedup hi-vs-lo;
      otherwise sleep ``WSE_SCALING_RETRY_SLEEP_S`` and re-probe, up to
      ``WSE_SCALING_GATE_RETRIES`` times, then record the window as
      rejected (disclosed, not silently dropped).
    - cool-down ``WSE_SCALING_PAUSE_S`` (default 150 s) between windows
      and ``WSE_SCALING_LEVEL_PAUSE_S`` (default 45 s) between the two
      builds of a window.

    Efficiency = median over accepted windows of
    (thru_hi / thru_lo) / (hi / lo).  Runs until
    ``WSE_SCALING_WINDOWS`` (default 3) windows are accepted or
    ``WSE_SCALING_MAX_WINDOWS`` (default 6) were attempted."""
    import random
    import statistics

    # generate the corpus up front so every child reads identical input
    _init_ray(NUM_CPUS)
    path = ensure_corpus(SCALING_CONVS)
    import ray
    ray.shutdown()
    # warm the page cache over the corpus once so the FIRST child is not
    # penalized with cold reads later children never pay
    import glob
    for f in glob.glob(os.path.join(path, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    lo, hi = SCALING_LEVELS
    ideal = hi / lo
    want = int(os.environ.get("WSE_SCALING_WINDOWS", "3"))
    max_windows = int(os.environ.get("WSE_SCALING_MAX_WINDOWS", "6"))
    pause_s = float(os.environ.get("WSE_SCALING_PAUSE_S", "150"))
    level_pause_s = float(os.environ.get("WSE_SCALING_LEVEL_PAUSE_S", "45"))
    probe_s = float(os.environ.get("WSE_SCALING_PROBE_S", "6"))
    min_cap = float(os.environ.get("WSE_SCALING_MIN_CAP",
                                   str(round(0.82 * ideal, 3))))
    # optional second gate on MEMORY-STREAM capacity (hi/lo aggregate
    # copy bandwidth): a window is node-like only if bandwidth scales
    # with the level too — on this VM that is expressible only below
    # the ~8-process bus knee, so default off; set e.g. 2.5 for a 2,8
    # run to accept only windows where the bus grants ~proportional
    # bandwidth (the faithful N-vs-4N-node emulation)
    min_stream = float(os.environ.get("WSE_SCALING_MIN_STREAM", "0"))
    gate_retries = int(os.environ.get("WSE_SCALING_GATE_RETRIES", "3"))
    retry_sleep = float(os.environ.get("WSE_SCALING_RETRY_SLEEP_S", "60"))
    rng = random.Random(20260818)
    windows = []
    accepted = []
    w = 0
    while len(accepted) < want and w < max_windows:
        if w:
            time.sleep(pause_s)
        # sustained capacity gate for THIS window
        probes = []
        ok = False
        for attempt in range(gate_retries + 1):
            p = _host_capacity_probe(lo, hi, dur=probe_s)
            probes.append(p)
            if p["capacity_hi_over_lo"] >= min_cap and \
                    p["stream_hi_over_lo"] >= min_stream:
                ok = True
                break
            if attempt < gate_retries:
                time.sleep(retry_sleep)
        rec = {"window": w, "gate_probes": probes, "gate_ok": ok,
               "min_cap": min_cap, "min_stream": min_stream}
        w += 1
        if not ok:
            rec["status"] = "rejected_by_gate"
            windows.append(rec)
            continue
        order = [lo, hi]
        rng.shuffle(order)
        rec["order"] = list(order)
        thru = {}
        fail = None
        for i, pcpus in enumerate(order):
            if i:
                time.sleep(level_pause_s)
            proc = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(pcpus)],
                capture_output=True, text=True, timeout=3600)
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                fail = f"scaling child {pcpus} failed"
                break
            res = json.loads(proc.stdout.strip().splitlines()[-1])
            thru[pcpus] = res["turns_per_sec"]
            rec[f"detail_{pcpus}"] = res
        if fail:
            rec["status"] = "child_failed"
            rec["error"] = fail
            windows.append(rec)
            continue
        cap = probes[-1]["capacity_hi_over_lo"]
        stream_cap = probes[-1]["stream_hi_over_lo"]
        rec["status"] = "accepted"
        rec["thru_lo"] = thru[lo]
        rec["thru_hi"] = thru[hi]
        rec["efficiency_raw"] = round((thru[hi] / thru[lo]) / ideal, 4)
        rec["efficiency_capacity_normalized"] = round(
            (thru[hi] / thru[lo]) / cap, 4)
        rec["efficiency_stream_normalized"] = round(
            (thru[hi] / thru[lo]) / max(stream_cap, 1e-9), 4)
        windows.append(rec)
        accepted.append(rec)
    if not accepted:
        raise SystemExit("no scaling window passed the capacity gate; "
                         "host too contended — retry later")
    effs = [r["efficiency_raw"] for r in accepted]
    effs_norm = [r["efficiency_capacity_normalized"] for r in accepted]
    effs_stream = [r["efficiency_stream_normalized"] for r in accepted]
    print(json.dumps({
        "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
        "levels": [lo, hi],
        "value": round(statistics.median(effs), 4),
        "capacity_normalized_value": round(statistics.median(effs_norm), 4),
        "stream_normalized_value": round(statistics.median(effs_stream), 4),
        "unit": "ratio",
        "scratch": os.environ.get("WSE_SCRATCH", "/dev/shm"),
        "protocol": (
            f"first-sample-per-window, {len(accepted)} accepted windows "
            f"(of {w} attempted), randomized level order, sustained "
            f"{probe_s:.0f}s/level capacity gate >= {min_cap} "
            f"(spin hi/lo), {pause_s:.0f}s window cool-down, "
            f"{level_pause_s:.0f}s between levels"),
        "thru_lo_turns_per_sec": statistics.median(
            [r["thru_lo"] for r in accepted]),
        "thru_hi_turns_per_sec": statistics.median(
            [r["thru_hi"] for r in accepted]),
        "per_window_efficiency": effs,
        "per_window_efficiency_capacity_normalized": effs_norm,
        "per_window_efficiency_stream_normalized": effs_stream,
        "windows": windows,
        "bench_corpus_convs": SCALING_CONVS,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        main_scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        os.environ["RAY_GRAFT_CPUS"] = sys.argv[2]
        NUM_CPUS = int(sys.argv[2])
        print(json.dumps(_scaling_child(NUM_CPUS)))
    else:
        main_bench()
