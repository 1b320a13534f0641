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
                    build_samples: int = 1) -> dict:
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
    build_secs = []
    for _ in range(max(1, build_samples)):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        stats = build_index(corpus_path, out_dir)
        build_secs.append(time.time() - t0)
    build_sec = statistics.median(build_secs)
    n_turns = stats["n_docs"]

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
                 "quality_score", "lang_id", "media_features"):
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
    out = os.path.join(scratch, f"wse_bench_idx_{num_cpus}")
    res = build_and_query(corpus, out)
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


def _host_noise_probe(lo: int, hi: int) -> dict:
    """~4 s probe of DELIVERED host capacity: aggregate spin throughput
    at 1, lo and hi processes.  On this shared VM the hypervisor often
    delivers only ~20-26 effective cores to 32 spinners, so
    spin_hi/spin_lo (the capacity the lo-vs-hi stand-in can physically
    express, ideal hi/lo) is recorded per sample pair and used to
    capacity-normalize scaling efficiency."""
    import concurrent.futures as cf

    def agg(nproc: int) -> int:
        if nproc == 1:
            return _spin_probe(1.0)
        with cf.ProcessPoolExecutor(max_workers=nproc) as ex:
            return sum(f.result() for f in
                       [ex.submit(_spin_probe, 1.0) for _ in range(nproc)])

    single = agg(1)
    s_lo = agg(lo)
    s_hi = agg(hi)
    return {"single_spin": single,
            f"spin{lo}_total": s_lo, f"spin{hi}_total": s_hi,
            f"spin{lo}_ratio": round(s_lo / single, 2),
            f"spin{hi}_ratio": round(s_hi / single, 2),
            "capacity_hi_over_lo": round(s_hi / s_lo, 3)}


def main_scaling() -> None:
    # generate the corpus up front so both children read identical input
    _init_ray(NUM_CPUS)
    path = ensure_corpus(SCALING_CONVS)
    import ray
    ray.shutdown()
    # warm the page cache over the corpus once so the FIRST child is not
    # penalized with cold reads the second child never pays
    import glob
    for f in glob.glob(os.path.join(path, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    # median-of-N protocol (BASELINE.md): samples interleave 8 and 32 so
    # shared-VM disk drift hits both levels equally; efficiency is
    # reported on the MEDIANS, with every sample disclosed.
    import statistics
    lo, hi = SCALING_LEVELS
    ideal = hi / lo
    n_samples = int(os.environ.get("WSE_SCALING_SAMPLES", "3"))
    samples: dict[int, list[float]] = {lo: [], hi: []}
    details = []
    noises = []
    # optional cool-down between samples: sustained back-to-back builds
    # on this shared VM degrade monotonically (burst-credit / memory-
    # bandwidth throttling) — a gap lets the host recover so later
    # samples measure the same machine the first one did
    pause_s = float(os.environ.get("WSE_SCALING_PAUSE_S", "0"))
    for s in range(n_samples):
        if s and pause_s:
            time.sleep(pause_s)
        noises.append(_host_noise_probe(lo, hi))  # capacity THIS pair
        for p in (lo, hi):
            proc = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(p)],
                capture_output=True, text=True, timeout=3600)
            if proc.returncode != 0:
                sys.stderr.write(proc.stderr[-4000:])
                raise SystemExit(f"scaling child {p} failed")
            res = json.loads(proc.stdout.strip().splitlines()[-1])
            samples[p].append(res["turns_per_sec"])
            details.append({"sample": s, "cpus": p, **res})
    med_lo = statistics.median(samples[lo])
    med_hi = statistics.median(samples[hi])
    eff = (med_hi / med_lo) / ideal
    # capacity-normalized: divide by what the host actually delivered
    # (spin_hi/spin_lo, ideal hi/lo) in each sample's window — the
    # stand-in cannot express more speedup than the hypervisor grants
    caps = [n["capacity_hi_over_lo"] for n in noises]
    per_eff_norm = [round((b / a) / c, 4) for a, b, c in
                    zip(samples[lo], samples[hi], caps)]
    print(json.dumps({
        "metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
        "levels": [lo, hi],
        "value": round(eff, 4),
        "capacity_normalized_value": round(
            statistics.median(per_eff_norm), 4),
        "unit": "ratio",
        "host_capacity_probes": noises,
        "scratch": os.environ.get("WSE_SCRATCH", "/dev/shm"),
        "protocol": f"median of {n_samples} interleaved samples per level; "
                    f"capacity probe (spin 1/{lo}/{hi} procs) before "
                    "each pair",
        "thru_lo_turns_per_sec": med_lo,
        "thru_hi_turns_per_sec": med_hi,
        "samples_lo": samples[lo],
        "samples_hi": samples[hi],
        "per_sample_efficiency": [round((b / a) / ideal, 4) for a, b in
                                  zip(samples[lo], samples[hi])],
        "per_sample_efficiency_capacity_normalized": per_eff_norm,
        "detail": details,
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
