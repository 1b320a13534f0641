"""Exact distributed top-k over an UNBOUNDED key space (heavy hitters)
via Misra-Gries candidate generation + exact recount.

Why this exists: `ngrams.top_bigrams` shuffles one partial-count row
per distinct gram — fine while the vocabulary is small relative to the
corpus, but k-gram spaces grow ~linearly with corpus size, so at
100 TB the "small" exchange becomes corpus-sized.  This operator keeps
per-batch state bounded by the MG capacity ``m`` REGARDLESS of the key
space:

1. **Candidates** — each batch counts its items exactly (vectorized
   pair-coding, no per-occurrence strings), then compresses to a
   Misra-Gries summary: subtract the (m+1)-th largest count from all,
   keep the <= m positive survivors.  Classic mergeable-summary bound
   (Agarwal et al., "Mergeable Summaries", PODS'12): each batch's
   dropped mass is <= N_batch/(m+1), so an item with TRUE total count
   > N/(m+1) has a positive residual in at least one batch and reaches
   the candidate set.  Only survivor rows (<= m per batch; strings
   materialized for survivors only) reach the driver.
2. **Exact recount** — candidate token tuples broadcast once via
   ``ray.put``; each batch folds the candidates through its OWN
   pair-code dictionaries (vectorized searchsorted joins — zero gram
   strings built) and emits <= |C| partial-count rows; the driver sums.
3. **Guarantee check** — the returned top-k is PROVABLY the true top-k
   iff the k-th recounted count > N/(m+1): no non-candidate can reach
   the boundary, and every boundary tie IS a candidate.  When
   N/(m+1) < 1 every item is trivially a candidate and the result is
   exact regardless.  Violations raise with guidance to raise ``m`` —
   a loud guard, never a silently-approximate answer (same pattern as
   the simhash / jaccard pair guards).

Driver state: O(m * n_batches) candidate strings worst case (~m in
practice); independent of corpus size AND key-space size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.spec import tokenize

_CAND_SCHEMA = {"gram": pa.string(), "val": pa.int64()}


def _doc_token_codes(texts: list[str]):
    """Factorized token codes + per-doc end offsets for one batch.
    Returns (codes int64[n_tok], uniques object[], doc_ends int64[])."""
    import pandas as pd
    all_toks: list[str] = []
    lens: list[int] = []
    for text in texts:
        toks = tokenize(text)
        if toks:
            all_toks.extend(toks)
            lens.append(len(toks))
    if not all_toks:
        return (np.empty(0, np.int64), np.empty(0, object),
                np.empty(0, np.int64))
    codes, uniques = pd.factorize(np.asarray(all_toks, dtype=object))
    return (codes.astype(np.int64), np.asarray(uniques, object),
            np.cumsum(np.asarray(lens, np.int64)))


def _gram_codes(codes: np.ndarray, doc_ends: np.ndarray, n: int):
    """Iterative pair-coding of n-grams.  Returns (final_codes, levels):
    final_codes[i] is a compact code of the n-gram starting at valid
    position i; levels[j] = (prev_idx, tok_idx) arrays mapping a
    level-(j+1) code to its (level-j code, token code) pair — together
    they reconstruct any gram without materializing all of them.
    A start is valid only when the whole gram stays inside one doc."""
    n_tok = len(codes)
    if n_tok < n:
        return np.empty(0, np.int64), []
    n_starts = n_tok - n + 1
    valid = np.ones(n_starts, bool)
    # a new doc starts at each doc_ends[i] (except the final one == n_tok):
    # starts s with s < b < s + n, i.e. s in [b-n+1, b-1], cross into it
    for b in doc_ends[:-1]:
        lo, hi = max(b - n + 1, 0), min(b, n_starts)
        if lo < hi:
            valid[lo:hi] = False
    cur = codes[:n_starts].copy()
    levels = []
    for off in range(1, n):
        nxt = codes[off:off + n_starts]
        K = int(nxt.max()) + 1
        pair = cur * K + nxt
        upair, inv = np.unique(pair, return_inverse=True)
        levels.append((upair // K, upair % K))
        cur = inv.astype(np.int64)
    return cur[valid], levels


def _reconstruct(final_codes: np.ndarray, levels, uniques: np.ndarray
                 ) -> np.ndarray:
    """Materialize gram strings for the (few) given final codes only."""
    if len(final_codes) == 0:
        return np.empty(0, object)
    tok_cols: list[np.ndarray] = []
    cur = final_codes
    for prev_idx, tok_idx in reversed(levels):
        tok_cols.append(tok_idx[cur])
        cur = prev_idx[cur]
    tok_cols.append(cur)           # level-0 code == token code at offset 0
    tok_cols.reverse()
    cols = [uniques[c] for c in tok_cols]
    return np.asarray([" ".join(p) for p in zip(*cols)], object)


def _mg_compress(item_codes: np.ndarray, m: int):
    """Exact batch counts -> MG summary codes (residual counts > 0)."""
    uc, cnt = np.unique(item_codes, return_counts=True)
    if len(uc) <= m:
        return uc
    kth = np.partition(cnt, len(cnt) - m - 1)[len(cnt) - m - 1]
    return uc[cnt > kth]


def heavy_ngrams(docs: "ray.data.Dataset", n: int, k: int,
                 m: int = 4096) -> pa.Table:
    """Exact top-k n-grams by occurrence count, ties broken by gram
    ascending (== ``ORDER BY n_occ DESC, gram LIMIT k``), with
    MG-bounded per-batch state; see module docstring.  Raises
    ValueError when ``m`` is too small for the exactness guarantee."""
    if k < 1 or n < 1 or m <= k:
        raise ValueError("need k >= 1, n >= 1, m > k")

    def _cand(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        codes, uniques, doc_ends = _doc_token_codes(texts)
        final, levels = _gram_codes(codes, doc_ends, n)
        if len(final) == 0:
            return pa.table({c: pa.array([], t)
                             for c, t in _CAND_SCHEMA.items()})
        mg_codes = _mg_compress(final, m)
        grams = _reconstruct(mg_codes, levels, uniques)
        # one marker row (gram="", val=batch item count) carries this
        # batch's total for the N/(m+1) bound — row-level, so it
        # survives any block coalescing/splitting between here and the
        # driver (grams are never empty strings: tokens are non-empty)
        return pa.table({
            "gram": pa.array(np.append(grams, ""), pa.string()),
            "val": pa.array(np.r_[np.ones(len(grams), np.int64),
                                  len(final)], pa.int64())})

    src = docs.select_columns(["text"])
    cand: set[str] = set()
    grand_n = 0
    for t in src.map_batches(_cand, batch_format="pyarrow",
                             zero_copy_batch=True).iter_batches(
                                 batch_format="pyarrow", batch_size=None):
        for g, v in zip(t.column("gram").to_pylist(),
                        t.column("val").to_pylist()):
            if g == "":
                grand_n += v
            else:
                cand.add(g)
    if not cand:
        return pa.table({"gram": pa.array([], pa.string()),
                         "n_occ": pa.array([], pa.int64())})

    cand_list = sorted(cand)
    cand_ref = ray.put([g.split(" ") for g in cand_list])

    def _recount(batch: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        texts = batch.column("text").to_pylist()
        codes, uniques, doc_ends = _doc_token_codes(texts)
        final, levels = _gram_codes(codes, doc_ends, n) \
            if len(codes) else (np.empty(0, np.int64), [])
        if len(final) == 0:
            return pa.table({"ci": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        # token string -> batch-local code, vectorized over candidates
        order = np.argsort(uniques)
        sorted_u = uniques[order]
        nc = len(cands)
        flat = np.asarray([t for ct in cands for t in ct], object)
        pos = np.searchsorted(sorted_u, flat)
        ok = pos < len(sorted_u)
        hit = np.zeros(len(flat), bool)
        hit[ok] = sorted_u[pos[ok]] == flat[ok]
        mapped = np.where(hit, order[np.clip(pos, 0, len(order) - 1)], -1)
        tok_codes = mapped.reshape(nc, n)
        present = (tok_codes >= 0).all(axis=1)
        # fold candidates through the SAME pair-code levels the batch
        # built: level-j uniques are sorted by pair value prev*K + tok,
        # so membership is one searchsorted per level
        cur = tok_codes[:, 0].copy()
        for j, (prev_idx, tok_idx) in enumerate(levels):
            Kj = int(tok_idx.max()) + 1      # == K used at build time
            pair_sorted = prev_idx * Kj + tok_idx
            want = cur * Kj + tok_codes[:, j + 1]
            p = np.searchsorted(pair_sorted, want)
            okp = p < len(pair_sorted)
            good = np.zeros(nc, bool)
            good[okp] = pair_sorted[p[okp]] == want[okp]
            present &= good
            cur = np.where(good, p, 0)
        counts = np.zeros(nc, np.int64)
        if present.any():
            fin_sorted = np.sort(final)
            tgt = cur[present]
            counts[present] = (np.searchsorted(fin_sorted, tgt, "right")
                               - np.searchsorted(fin_sorted, tgt, "left"))
        nz = np.flatnonzero(counts)
        return pa.table({"ci": pa.array(nz, pa.int64()),
                         "c": pa.array(counts[nz], pa.int64())})

    totals = np.zeros(len(cand_list), np.int64)
    for t in src.map_batches(_recount, batch_format="pyarrow",
                             zero_copy_batch=True).iter_batches(
                                 batch_format="pyarrow", batch_size=None):
        if t.num_rows:
            totals[np.asarray(t.column("ci"))] += np.asarray(t.column("c"))

    sel = np.lexsort((np.asarray(cand_list, object), -totals))[:k]
    bound = grand_n / (m + 1)
    kth_count = int(totals[sel[-1]]) if len(sel) else 0
    if bound >= 1 and (len(cand_list) < k or kth_count <= bound):
        raise ValueError(
            f"heavy_ngrams exactness guarantee violated: k-th count "
            f"{kth_count} <= N/(m+1) = {bound:.1f} (or fewer than k "
            f"candidates); raise m (currently {m})")
    return pa.table({
        "gram": pa.array([cand_list[i] for i in sel], pa.string()),
        "n_occ": pa.array(totals[sel], pa.int64())})
