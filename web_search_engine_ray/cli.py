"""CLI entry points (the `ray job submit` surface of the engine).

    python -m web_search_engine_ray.cli build --input <parquet-dir> \
        --out /tmp/idx [--input-kind transcripts|corpus] [--resume] \
        [--filter "role != 'tool'"] [--dedup] [--num-buckets 64]

    python -m web_search_engine_ray.cli query --index /tmp/idx \
        --queries <parquet> [--k 10] [--mode wand|exhaustive] \
        [--out results.parquet]

    python -m web_search_engine_ray.cli gen --convs 5000 --out <dir>

These own a Ray session (guarded init, shutdown at exit) — library code
never does (driver contract, __ray_entry__.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = {"include_dashboard": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="web_search_engine_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an inverted index (E1)")
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--input-kind", default="transcripts",
                   choices=["transcripts", "corpus"])
    b.add_argument("--resume", action="store_true")
    b.add_argument("--dedup", action="store_true")
    b.add_argument("--filter", default=None)
    b.add_argument("--num-buckets", type=int, default=None)
    b.add_argument("--salt-s", type=int, default=None)

    q = sub.add_parser("query", help="serve BM25 top-k (E2)")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True,
                   help="parquet with (query_id, query), or '-' for stdin "
                        "lines")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="wand", choices=["wand", "exhaustive"])
    q.add_argument("--out", default=None, help="results parquet (else stdout)")

    g = sub.add_parser("gen", help="deterministic synthetic corpus (S6)")
    g.add_argument("--convs", type=int, required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)
    ray = _init_ray(args.num_cpus)
    try:
        if args.cmd == "build":
            from web_search_engine_ray.pipelines.build import build_index
            from web_search_engine_ray.spec import DEFAULT_CONFIG, EngineConfig
            cfg = DEFAULT_CONFIG
            overrides = {}
            if args.num_buckets:
                overrides["num_buckets"] = args.num_buckets
            if args.salt_s:
                overrides["salt_s"] = args.salt_s
            if overrides:
                import dataclasses
                cfg = dataclasses.replace(cfg, **overrides)
            stats = build_index(args.input, args.out, cfg,
                                input_kind=args.input_kind,
                                filter_expr=args.filter, dedup=args.dedup,
                                resume=args.resume)
            print(json.dumps(stats))
        elif args.cmd == "query":
            import pyarrow as pa
            import pyarrow.parquet as pq

            from web_search_engine_ray.pipelines.query import run_queries
            if args.queries == "-":
                lines = [ln.strip() for ln in sys.stdin if ln.strip()]
                queries = pa.table({
                    "query_id": pa.array(range(len(lines)), pa.int64()),
                    "query": pa.array(lines, pa.string())})
            else:
                queries = pq.read_table(args.queries)
            res = run_queries(args.index, queries, k=args.k, mode=args.mode,
                              attach_doc_meta=True)
            if args.out:
                pq.write_table(res, args.out)
                print(f"{res.num_rows} rows -> {args.out}")
            else:
                print(res.to_pandas().to_string(index=False))
        elif args.cmd == "gen":
            from web_search_engine_ray.sources.transcripts import \
                gen_transcripts
            gen_transcripts(args.convs, seed=args.seed).write_parquet(args.out)
            print(f"wrote {args.convs} conversations -> {args.out}")
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
