"""Training-data curation pipelines: benchmark decontamination,
deterministic train/val splits, Gopher-style repetition signals, and
exact phrase search over the inverted index.

All four are streaming Ray Data compositions over the generic documents
corpus (doc_id:int64, text:string, ...):

- ``decontaminate``  — n-gram-overlap contamination check of a corpus
  against a benchmark/eval set (the GPT-3/PaLM "13-gram" style filter,
  parameterised k).  The benchmark side is the SMALL side by definition
  (an eval set is thousands of docs, the corpus is billions), so its
  distinct gram hashes are broadcast once via ``ray.put`` and the corpus
  streams through one vectorized ``map_batches`` — no corpus shuffle.
- ``train_val_split`` — salt-free deterministic hash split on doc_id
  (md5 hex prefix threshold), reproducible across runs / partitionings.
- ``quality_gate_ds`` / ``curate_corpus_ds`` — the Dataset-native
  (streaming) forms of the percentile gate and the composed curation
  pipeline; the same-named table-returning functions are thin
  collecting wrappers for the sf-scale oracle queries.
- ``repetition_stats`` — per-doc duplicate-token / duplicate-2-gram /
  top-2-gram fractions (the Gopher repetition quality gates).
- ``phrase_search``  — exact token-adjacency phrase match: candidate
  docs from a conjunctive posting-list intersection on the index
  (lossless pruning: a phrase match implies every term matches), then
  distributed regex verification over a candidate-filtered read of the
  corpus — only candidate texts leave storage.
"""

from __future__ import annotations

import os
import re
import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

# --- decontamination ------------------------------------------------------

DECONTAM_K = 4  # pinned n-gram width for the driver query (docs are short)


def _gram_hashes(texts: list[str], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT k-gram hashes over the pinned tokenizer.

    Returns (hashes:uint64, doc_run_lengths:int64) — grams are md5-64bit
    hashed so the broadcast benchmark set is 8 bytes/gram regardless of
    gram text length (collision odds at 1e9 grams: ~n^2/2^65 ≈ 0.03
    expected pairs — negligible vs an exact-string join).  md5 runs once
    per DISTINCT gram in the batch (factorize + per-doc np.unique over
    integer codes), not per occurrence — the winnow_batch kernel shape."""
    import pandas as pd

    from web_search_engine_ray.spec import tokenize
    grams_all: list[str] = []
    runs = np.zeros(len(texts), np.int64)      # grams per doc, with dups
    for i, text in enumerate(texts):
        toks = tokenize(text)
        n = len(toks) - k + 1
        if n <= 0:
            continue
        grams_all.extend(" ".join(toks[j:j + k]) for j in range(n))
        runs[i] = n
    lens = np.zeros(len(texts), np.int64)
    if not grams_all:
        return np.empty(0, np.uint64), lens
    codes, uniques = pd.factorize(np.asarray(grams_all, dtype=object))
    dig = np.fromiter(
        (int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "little")
         for u in uniques), np.uint64, len(uniques))
    out: list[np.ndarray] = []
    off = 0
    for i, n in enumerate(runs):
        if n == 0:
            continue
        u = np.unique(codes[off:off + n])
        off += n
        out.append(dig[u])
        lens[i] = len(u)
    return np.concatenate(out), lens


def benchmark_grams(bench: "ray.data.Dataset", k: int = DECONTAM_K
                    ) -> np.ndarray:
    """Distinct k-gram hashes of the benchmark set (the broadcast side).

    Scale note: this is bounded by the BENCHMARK's size (eval sets are
    ~10^3..10^6 docs), never the corpus — the one driver-side structure
    here is benchmark-sized by construction."""
    def _g(batch: pa.Table) -> pa.Table:
        h, _ = _gram_hashes(batch.column("text").to_pylist(), k)
        return pa.table({"gram_h": pa.array(np.unique(h), pa.uint64())})

    parts = bench.select_columns(["text"]).map_batches(
        _g, batch_format="pyarrow", zero_copy_batch=True)
    # driver-side union of per-batch DISTINCT hash arrays (benchmark-
    # sized); Dataset.unique is avoided because Ray's aggregate path
    # round-trips uint64 through Python ints and overflows int64.
    chunks = [b.column("gram_h").to_numpy()
              for b in parts.iter_batches(batch_format="pyarrow")]
    if not chunks:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(chunks))


def decontaminate_ds(corpus: "ray.data.Dataset", bench: "ray.data.Dataset",
                     k: int = DECONTAM_K) -> "ray.data.Dataset":
    """Streaming form of :func:`decontaminate`: the (doc_id,
    n_shared_grams) contamination report as a Dataset — use this when
    the contaminated set itself may be large (e.g. a benchmark that
    leaked wholesale into the crawl), writing it with ``write_parquet``
    instead of collecting."""
    bench_ref = ray.put(benchmark_grams(bench, k))

    def _check(batch: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)           # zero-copy plasma view
        h, lens = _gram_hashes(batch.column("text").to_pylist(), k)
        hits = np.zeros(len(lens), np.int64)
        if len(h):
            # one vectorized membership probe over the whole batch
            member = np.isin(h, bset, assume_unique=False)
            ends = np.cumsum(lens)
            hits = np.add.reduceat(
                np.concatenate([member.astype(np.int64), [0]]),
                np.concatenate([[0], ends[:-1]]))
            hits[lens == 0] = 0
        keep = hits > 0
        ids = batch.column("doc_id").to_numpy()[keep]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_shared_grams": pa.array(hits[keep], pa.int64())})

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        _check, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate(corpus: "ray.data.Dataset", bench: "ray.data.Dataset",
                  k: int = DECONTAM_K) -> pa.Table:
    """Corpus docs sharing >= 1 distinct k-gram with the benchmark set.

    Returns (doc_id, n_shared_grams) sorted by doc_id — n_shared_grams
    counts the doc's DISTINCT contaminated grams (the usual removal /
    reporting signal).  One benchmark pass + one corpus ``map_batches``
    against the ``ray.put``-broadcast gram-hash set; the corpus is never
    shuffled and never leaves streaming execution.  This collecting
    wrapper suits the usual case (contamination is report-sized); see
    decontaminate_ds when it may not be."""
    parts = decontaminate_ds(corpus, bench, k)
    tbl = pa.concat_tables(
        [b for b in parts.iter_batches(batch_format="pyarrow")]
        or [pa.table({"doc_id": pa.array([], pa.int64()),
                      "n_shared_grams": pa.array([], pa.int64())})])
    return tbl.sort_by("doc_id")


# --- deterministic train/val split ---------------------------------------


def split_threshold_hex(val_frac: float) -> str:
    """Pinned split rule: doc goes to 'val' iff the first 4 hex chars of
    md5(str(doc_id)) sort strictly below this threshold.  Fixed-width
    lowercase hex compares lexicographically == numerically, so the same
    rule is one ``substr(md5(...),1,4) < '{hex}'`` in the DuckDB oracle."""
    return format(min(0xFFFF, int(val_frac * 0x10000)), "04x")


def train_val_split(docs: "ray.data.Dataset", val_frac: float = 0.1
                    ) -> "ray.data.Dataset":
    """(doc_id, split) with split in {'train','val'} — a pure function of
    doc_id: stable under re-runs, repartitioning, and corpus growth
    (existing docs never flip when new docs arrive).  No shuffle."""
    thr = split_threshold_hex(val_frac)

    def _split(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        splits = ["val" if hashlib.md5(str(i).encode()).hexdigest()[:4] < thr
                  else "train" for i in ids]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "split": pa.array(splits, pa.string())})

    return docs.select_columns(["doc_id"]).map_batches(
        _split, batch_format="pyarrow", zero_copy_batch=True)


# --- repetition / quality signals (Gopher-style) --------------------------


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Per-doc repetition fractions over the pinned tokenizer:

    - dup_token_frac: fraction of token OCCURRENCES whose token appears
      more than once in the doc
    - top_2gram_frac: occurrences of the most frequent 2-gram / total
      2-gram occurrences
    - dup_2gram_frac: fraction of 2-gram occurrences whose gram repeats

    Zeros when the doc has no tokens / no 2-grams.  One np.unique per
    doc (token counts) — numpy kernels, no Python counting loops."""
    from web_search_engine_ray.spec import tokenize
    n_tok = []
    dup_tok = []
    top_2g = []
    dup_2g = []
    for text in batch.column("text").to_pylist():
        toks = tokenize(text)
        n = len(toks)
        n_tok.append(n)
        if n == 0:
            dup_tok.append(0.0)
            top_2g.append(0.0)
            dup_2g.append(0.0)
            continue
        arr = np.asarray(toks, dtype=object)
        _, inv, cnt = np.unique(arr, return_inverse=True, return_counts=True)
        dup_tok.append(float(np.sum(cnt[cnt > 1])) / n)
        if n < 2:
            top_2g.append(0.0)
            dup_2g.append(0.0)
            continue
        # 2-grams as pairs of token codes — integer pairing, no strings
        pair = inv[:-1].astype(np.int64) * len(cnt) + inv[1:]
        pcnt = np.unique(pair, return_counts=True)[1]
        tot = float(n - 1)
        top_2g.append(float(pcnt.max()) / tot)
        dup_2g.append(float(np.sum(pcnt[pcnt > 1])) / tot)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n_tok, pa.int64()),
        "dup_token_frac": pa.array(np.round(dup_tok, 6), pa.float64()),
        "top_2gram_frac": pa.array(np.round(top_2g, 6), pa.float64()),
        "dup_2gram_frac": pa.array(np.round(dup_2g, 6), pa.float64()),
    })


def repetition_stats(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Gopher-style repetition quality signals, one streaming map."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow", zero_copy_batch=True)


# --- end-to-end corpus curation --------------------------------------------


# filter-expression-safe source names (Ray's expr grammar has no quote
# escaping); anything else goes through the pyarrow-mask path below.
_SAFE_SOURCE = re.compile(r"[A-Za-z0-9_.:\- ]*\Z")


def _split_stripes(docs: "ray.data.Dataset", bench_source: str
                   ) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """(corpus, bench) = docs partitioned on source == bench_source.

    Safe names use ``filter(expr=...)`` (predicate pushdown into the
    parquet read); names the expr grammar can't represent (quotes etc.)
    fall back to a streaming pyarrow-compute mask — never string
    interpolation of untrusted values into the expression language."""
    if _SAFE_SOURCE.match(bench_source):
        return (docs.filter(expr=f"source != '{bench_source}'"),
                docs.filter(expr=f"source == '{bench_source}'"))
    import pyarrow.compute as pc

    def _stripe(want_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            eq = pc.equal(batch.column("source"), pa.scalar(bench_source))
            return batch.filter(eq if want_bench else pc.invert(eq))
        return f

    kw = dict(batch_format="pyarrow", zero_copy_batch=True)
    return (docs.map_batches(_stripe(False), **kw),
            docs.map_batches(_stripe(True), **kw))


def add_split_column(ds: "ray.data.Dataset", val_frac: float = 0.1
                     ) -> "ray.data.Dataset":
    """Append the deterministic md5(doc_id) 'split' label as a streaming
    ``map_batches`` stage (the Dataset-composable form of
    train_val_split) — labels are computed inside workers; the driver
    never walks doc_ids."""
    thr = split_threshold_hex(val_frac)

    def _lab(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        lab = ["val" if hashlib.md5(str(i).encode()).hexdigest()[:4] < thr
               else "train" for i in ids]
        return batch.append_column("split", pa.array(lab, pa.string()))

    return ds.map_batches(_lab, batch_format="pyarrow",
                          zero_copy_batch=True)


def curate_corpus_ds(docs: "ray.data.Dataset", bench_source: str,
                     k: int = DECONTAM_K, q: float = 0.5,
                     val_frac: float = 0.1,
                     checkpoint_dir: str | None = None
                     ) -> "ray.data.Dataset":
    """The flagship training-data story, composed from this module's
    operators in the order a real pre-training pipeline runs them:

    1. exact dedup      — keep min doc_id per distinct text
                          (md5-keyed groupby; analysis.exact_dedup);
    2. decontamination  — drop docs sharing >= 1 distinct k-gram with
                          the ``bench_source`` stripe (broadcast gram
                          set; corpus never shuffles);
    3. quality gate     — keep docs at/above their lang's quantile_disc
                          token-count threshold, thresholds computed
                          over the docs that SURVIVED 1-2;
    4. split            — deterministic md5(doc_id) train/val labels,
                          applied as a worker-side map stage.

    Returns a STREAMING Dataset of (doc_id, lang, n_tokens, split) —
    every stage composes Dataset->Dataset; the only driver-side state is
    output-bounded (contaminated-id table, per-lang thresholds).  A
    100-TB caller follows with ``write_parquet``.

    The survivor lineage (dedup groupby + semi/anti joins) is consumed
    THREE times downstream (quality threshold pass, gate pass, final
    consumption); pure lineage re-executes it each time.
    ``checkpoint_dir`` lands the stage-2 survivors once as parquet and
    re-reads them instead — the standard mid-pipeline checkpoint for a
    long curation chain (also the resume point after a crash)."""
    from web_search_engine_ray.functions.grouping import anti_join, semi_join
    from web_search_engine_ray.pipelines.analysis import exact_dedup

    corpus, bench = _split_stripes(docs, bench_source)
    keep = exact_dedup(corpus.select_columns(["doc_id", "text"])) \
        .select_columns(["doc_id"])
    kept = semi_join(corpus, keep, on="doc_id")
    cont = decontaminate(kept.select_columns(["doc_id", "text"]), bench, k)
    if cont.num_rows:
        kept = anti_join(kept, ray.data.from_arrow(
            cont.select(["doc_id"])), on="doc_id")
    kept = kept.select_columns(["doc_id", "lang", "text"])
    if checkpoint_dir is not None:
        # tokenize ONCE at checkpoint time and land only the skinny
        # (doc_id, lang, n_tokens) stats — the gate's two downstream
        # passes then stream 3 fixed-width columns and never re-read
        # or re-tokenize the text
        from web_search_engine_ray.spec import tokenize

        def _stats(batch: pa.Table) -> pa.Table:
            n_tok = [len(tokenize(t))
                     for t in batch.column("text").to_pylist()]
            return pa.table({"doc_id": batch.column("doc_id"),
                             "lang": batch.column("lang"),
                             "n_tokens": pa.array(n_tok, pa.int64())})

        surv_dir = os.path.join(checkpoint_dir, "survivors")
        if not os.path.exists(os.path.join(surv_dir, "_DONE")):
            import shutil
            shutil.rmtree(surv_dir, ignore_errors=True)
            kept.map_batches(_stats, batch_format="pyarrow",
                             zero_copy_batch=True) \
                .write_parquet(surv_dir, compression="zstd")
            with open(os.path.join(surv_dir, "_DONE"), "w") as f:
                f.write("ok")
        kept = ray.data.read_parquet(
            surv_dir, columns=["doc_id", "lang", "n_tokens"])
    gated = quality_gate_ds(kept, q=q)
    return add_split_column(gated, val_frac)


def curate_corpus(docs: "ray.data.Dataset", bench_source: str,
                  k: int = DECONTAM_K, q: float = 0.5,
                  val_frac: float = 0.1) -> pa.Table:
    """Driver-query wrapper over :func:`curate_corpus_ds`: collects and
    sorts the curated rows for the sf-scale oracle comparison.  The
    COLLECTION lives here, in the query, on purpose — the operator
    itself streams; use curate_corpus_ds + write_parquet at scale.
    Uses a throwaway survivor checkpoint so the dedup/join lineage runs
    once instead of three times."""
    import shutil
    import tempfile
    ckpt = tempfile.mkdtemp(prefix="wse_curate_")
    try:
        out = pa.concat_tables(list(
            curate_corpus_ds(docs, bench_source, k=k, q=q,
                             val_frac=val_frac, checkpoint_dir=ckpt)
            .iter_batches(batch_format="pyarrow")) or
            [pa.table({"doc_id": pa.array([], pa.int64()),
                       "lang": pa.array([], pa.string()),
                       "n_tokens": pa.array([], pa.int64()),
                       "split": pa.array([], pa.string())})])
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return out.sort_by([("doc_id", "ascending")])


# --- percentile-based quality gating ---------------------------------------


def quality_gate_ds(docs: "ray.data.Dataset", q: float = 0.5
                    ) -> "ray.data.Dataset":
    """Keep docs whose token count reaches their language's q-quantile
    (quantile_disc) — the percentile-based quality filter every
    training-data pipeline runs before mixing corpora.

    Two streaming passes (both tokenize unless the input already
    carries ``n_tokens`` — see below; the skinny per-doc stats are
    NOT materialized — at 10^12 docs re-tokenizing is cheaper than
    landing a corpus-length table):
    1. per-lang thresholds via the shuffle-one-exchange
       grouped_quantiles over a (lang, n_tokens) map;
    2. a filter pass against the ray.put-broadcast {lang: threshold}
       dict (bounded by |langs|) — lang dictionary-encoded per batch,
       thresholds gathered per code, one vectorized compare.

    Returns a STREAMING Dataset of (doc_id, lang, n_tokens) survivors —
    the only tables that reach the driver here are |langs|-bounded;
    callers write_parquet or aggregate the result."""
    from web_search_engine_ray.pipelines.quantiles import grouped_quantiles
    from web_search_engine_ray.spec import tokenize

    # inputs carrying a precomputed n_tokens column (e.g. the skinny
    # survivor checkpoint from curate_corpus_ds) skip tokenization
    # entirely — both passes then stream 3 fixed-width columns
    pre = "n_tokens" in docs.schema().names

    def _stats(batch: pa.Table) -> pa.Table:
        if pre:
            return batch.select(["doc_id", "lang", "n_tokens"])
        n_tok = [len(tokenize(t)) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "lang": batch.column("lang"),
                         "n_tokens": pa.array(n_tok, pa.int64())})

    src = docs.select_columns(
        ["doc_id", "lang", "n_tokens"] if pre else
        ["doc_id", "lang", "text"])
    med = grouped_quantiles(src.map_batches(
        _stats, batch_format="pyarrow", zero_copy_batch=True),
        key="lang", col="n_tokens", qs=[q])
    thr = {lang: float(v) for lang, v in
           zip(med.column("lang").to_pylist(),
               med.column("value").to_pylist())}
    thr_ref = ray.put(thr)

    def _gate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = ray.get(thr_ref)
        s = _stats(batch)
        if s.num_rows == 0:
            return s
        enc = pc.dictionary_encode(s.column("lang")).combine_chunks()
        codes = np.asarray(enc.indices.to_numpy(zero_copy_only=False),
                           np.int64)
        thr_by_code = np.asarray(
            [t.get(lg, np.inf) for lg in enc.dictionary.to_pylist()],
            np.float64)
        keep = s.column("n_tokens").to_numpy() >= thr_by_code[codes]
        return s.filter(pa.array(keep))

    return src.map_batches(_gate, batch_format="pyarrow",
                           zero_copy_batch=True)


def quality_gate(docs: "ray.data.Dataset", q: float = 0.5) -> pa.Table:
    """Driver-query wrapper over :func:`quality_gate_ds`: collects and
    sorts the surviving (doc_id, lang, n_tokens) rows for the oracle
    comparison.  At sf scale the survivors fit the driver; the OPERATOR
    (quality_gate_ds) never lands a corpus-length table — 100-TB
    callers consume the Dataset with write_parquet."""
    out = pa.concat_tables(list(
        quality_gate_ds(docs, q).iter_batches(batch_format="pyarrow")) or
        [pa.table({"doc_id": pa.array([], pa.int64()),
                   "lang": pa.array([], pa.string()),
                   "n_tokens": pa.array([], pa.int64())})])
    return out.sort_by([("doc_id", "ascending")])


# --- exact phrase search ---------------------------------------------------


def phrase_regex(phrase: str) -> str:
    """Token-adjacency as a regex over lower(text): terms separated by
    >= 1 non-[a-z0-9] char, anchored at token boundaries on both ends.
    Identical semantics in Python re and DuckDB RE2 for this construct —
    the engine verifier and the SQL oracle share it by construction."""
    from web_search_engine_ray.spec import tokenize
    terms = tokenize(phrase)
    return ("(^|[^a-z0-9])" + "[^a-z0-9]+".join(terms) + "([^a-z0-9]|$)")


# shard the stage-1 posting intersection past this many candidate
# postings; each shard handles ~_CAND_SHARD_POSTINGS of the phrase's
# rarest-term postings (mirrors scorer.HEAVY_POSTINGS discipline)
_CAND_SHARD_POSTINGS = 500_000


@ray.remote
def _phrase_cand_shard(index_dir: str, pid: int, terms: list[str],
                       lo: int, hi: int) -> tuple[int, np.ndarray]:
    """Conjunctive posting intersection for ONE phrase restricted to
    doc_ids in [lo, hi) — runs in a worker over the per-worker-process
    IndexReader singleton; only the posting blocks intersecting the
    range decode (decoded_range).  Terms arrive rarest-first so the
    running candidate set shrinks as fast as possible."""
    from web_search_engine_ray.stages.scorer import _worker_reader
    reader = _worker_reader(index_dir, None)
    ids: np.ndarray | None = None
    for term in terms:
        pair = reader.decoded_range(term, lo, hi)
        if pair is None or len(pair[0]) == 0:
            return pid, np.empty(0, np.int64)
        docs = pair[0]
        ids = docs if ids is None \
            else ids[np.isin(ids, docs, assume_unique=True)]
        if len(ids) == 0:
            break
    return pid, np.asarray(ids, np.int64)


def phrase_search(index_dir: str, docs: "ray.data.Dataset",
                  phrases: list[tuple[int, str]],
                  max_shards: int | None = None) -> pa.Table:
    """Exact phrase match: (phrase_id, doc_id) for every doc whose token
    stream contains the phrase's tokens consecutively.

    Stage 1 (index): conjunctive intersection of the phrase terms'
    posting lists — lossless pruning (adjacency implies conjunction) —
    runs DISTRIBUTED: per-phrase doc-range shard tasks intersect
    rarest-term-first inside workers (decoded_range decodes only each
    shard's posting blocks), so no posting list is ever decoded on the
    driver and per-task memory is bounded by a shard's postings, not a
    hot term's df.  The driver holds dictionary metadata (term -> df,
    for shard planning) and the returned candidate doc_id arrays only.
    Stage 2 (verify): ONE candidate-filtered streaming pass over the
    corpus; each batch checks only the phrases whose candidate set hits
    it, with regexes compiled once per task.  Texts never leave workers.

    Scale note: a positional postings stream would replace stage 2's
    text fetch with position-list adjacency checks (see
    pipelines/positional.py); candidate-filtered verification is the
    standard non-positional fallback and touches only |candidates|
    docs."""
    from web_search_engine_ray.spec import tokenize
    from web_search_engine_ray.stages.scorer import load_dictionary
    from web_search_engine_ray.state.manifest import read_stats
    # driver side: dictionary METADATA lookups only (df per term — the
    # shard planner's input); posting decode happens in the tasks.
    # When a CURRENT term-range-sharded dictionary exists (fingerprint
    # matches the live index — stale copies from a rebuild are skipped),
    # the driver touches O(phrase terms) shards instead of
    # materializing the whole vocab.
    dictionary = load_dictionary(index_dir)
    n_docs = int(read_stats(index_dir)["max_doc_id"]) + 1
    if max_shards is None:
        max_shards = max(1, int(ray.cluster_resources().get("CPU", 4)))
    refs = []
    for pid, phrase in phrases:
        terms = sorted(set(tokenize(phrase)))
        entries = [dictionary.get(t) for t in terms]
        if not terms or any(e is None for e in entries):
            continue                      # a missing term matches nothing
        # rarest term first: the first decode bounds the candidate set
        order = np.argsort([e[1] for e in entries], kind="stable")
        terms = [terms[i] for i in order]
        min_df = entries[order[0]][1]
        n_shards = int(min(max_shards,
                           max(1, min_df // _CAND_SHARD_POSTINGS)))
        bounds = np.linspace(0, n_docs, n_shards + 1).astype(np.int64)
        refs.extend(_phrase_cand_shard.remote(
            index_dir, pid, terms, int(bounds[i]), int(bounds[i + 1]))
            for i in range(n_shards))
    cand: dict[int, list[np.ndarray]] = {}
    for pid, ids in ray.get(refs):
        if len(ids):
            # disjoint ascending doc ranges -> per-phrase concatenation
            # stays sorted-unique (shards arrive in range order)
            cand.setdefault(pid, []).append(ids)
    cand: dict[int, np.ndarray] = {
        pid: np.concatenate(parts) for pid, parts in cand.items()}
    empty = pa.table({"phrase_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})
    if not cand:
        return empty
    pat_by_pid = {pid: phrase_regex(ph) for pid, ph in phrases}
    cand_ref = ray.put(cand)
    all_ids = np.unique(np.concatenate(list(cand.values())))
    ids_ref = ray.put(all_ids)

    def _verify(batch: pa.Table) -> pa.Table:
        import re
        keep = np.isin(batch.column("doc_id").to_numpy(), ray.get(ids_ref))
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return empty
        cands = ray.get(cand_ref)
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        out_pid, out_doc = [], []
        for pid, pat in pat_by_pid.items():
            c = cands.get(pid)
            if c is None:
                continue
            hit_rows = np.flatnonzero(np.isin(ids, c, assume_unique=False))
            if len(hit_rows) == 0:
                continue
            rx = re.compile(pat)
            for r in hit_rows:
                if rx.search(texts[r].lower()):
                    out_pid.append(pid)
                    out_doc.append(int(ids[r]))
        return pa.table({"phrase_id": pa.array(out_pid, pa.int64()),
                         "doc_id": pa.array(out_doc, pa.int64())})

    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        _verify, batch_format="pyarrow", zero_copy_batch=True)
    tbl = pa.concat_tables(
        [b for b in parts.iter_batches(batch_format="pyarrow")] or [empty])
    return tbl.sort_by([("phrase_id", "ascending"), ("doc_id", "ascending")])
