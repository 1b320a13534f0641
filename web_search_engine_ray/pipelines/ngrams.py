"""Corpus n-gram statistics and tf-idf keyword extraction.

- ``bigram_counts`` — corpus-wide adjacent-pair counts: per-batch
  partial aggregation (one np.unique over integer pair codes per
  batch — the combiner), then ONE hash exchange on the bigram string
  and a vectorized per-partition sum.  The shuffle moves one row per
  DISTINCT bigram per batch, never per occurrence.
- ``top_bigrams`` — global top-k by count: after the keyed sum each
  bigram's total lives in exactly one block, so a per-block top-k
  candidate pass + a driver merge of k·n_blocks skinny rows replaces a
  global sort.
- ``pmi_bigrams`` — pointwise mutual information collocations:
  bigram counts joined (hash join on the term — the 100 TB path; no
  vocab-sized broadcast) with unigram counts on both components,
  ln((c_ab/T2) / ((c_a/T1)(c_b/T1))), min-count filtered, top-k.
- ``tfidf_keywords`` — per-doc top-k terms by tf·idf with
  idf = ln(N/df): per-(doc,term) tf rows joined to the df table on
  term, then group_topk per doc (hash partition + one vectorized
  pass, never a global sort).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.functions.grouping import (group_slices,
                                                      hash_partition)

_EMPTY_COUNTS = pa.table({"bigram": pa.array([], pa.string()),
                          "n_occ": pa.array([], pa.int64())})


def _bigram_partial(batch: pa.Table) -> pa.Table:
    """Combiner: distinct bigram -> occurrence count within this batch.
    2-grams are counted as integer code pairs; strings materialize only
    once per distinct bigram."""
    import pandas as pd

    from web_search_engine_ray.spec import tokenize
    all_toks: list[str] = []
    counts: list[int] = []
    for text in batch.column("text").to_pylist():
        toks = tokenize(text)
        if toks:
            all_toks.extend(toks)
            counts.append(len(toks))
    if not all_toks:
        return _EMPTY_COUNTS
    code, uniques = pd.factorize(np.asarray(all_toks, dtype=object))
    code = code.astype(np.int64)
    cnt = np.asarray(counts, np.int64)
    ends = np.cumsum(cnt)
    # adjacent pairs, masking doc boundaries
    valid = np.ones(len(code) - 1, bool) if len(code) > 1 else \
        np.zeros(0, bool)
    valid[ends[:-1] - 1] = False          # last token of each doc
    a = code[:-1][valid]
    b = code[1:][valid]
    if len(a) == 0:
        return _EMPTY_COUNTS
    pair = a * len(uniques) + b
    upair, c = np.unique(pair, return_counts=True)
    ua = uniques[(upair // len(uniques)).astype(np.int64)]
    ub = uniques[(upair % len(uniques)).astype(np.int64)]
    grams = np.asarray([f"{x} {y}" for x, y in zip(ua, ub)], dtype=object)
    return pa.table({"bigram": pa.array(grams, pa.string()),
                     "n_occ": pa.array(c, pa.int64())})


def _sum_by_key(key: str, val: str):
    def _sum_partition(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        idx = pa.compute.sort_indices(batch, sort_keys=[(key, "ascending")])
        t = batch.take(idx)
        keys_np = np.asarray(t.column(key).to_pylist(), dtype=object)
        vals = t.column(val).to_numpy()
        starts, ends = group_slices([keys_np])
        sums = np.add.reduceat(vals, starts)
        return pa.table({key: pa.array(keys_np[starts], pa.string()),
                         val: pa.array(sums, pa.int64())})
    return _sum_partition


def bigram_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(bigram, n_occ) with global counts — combiner + one hash shuffle."""
    partial = docs.select_columns(["text"]).map_batches(
        _bigram_partial, batch_format="pyarrow", zero_copy_batch=True)
    return hash_partition(partial, ["bigram"]).map_batches(
        _sum_by_key("bigram", "n_occ"), batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True)


def unigram_counts(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(term, n_occ) — same combiner + exchange shape as bigram_counts."""
    import pandas as pd

    from web_search_engine_ray.spec import tokenize

    def _partial(batch: pa.Table) -> pa.Table:
        toks: list[str] = []
        for text in batch.column("text").to_pylist():
            toks.extend(tokenize(text))
        if not toks:
            return pa.table({"term": pa.array([], pa.string()),
                             "n_occ": pa.array([], pa.int64())})
        code, uniques = pd.factorize(np.asarray(toks, dtype=object))
        c = np.bincount(code)
        return pa.table({"term": pa.array(uniques, pa.string()),
                         "n_occ": pa.array(c, pa.int64())})

    partial = docs.select_columns(["text"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    return hash_partition(partial, ["term"]).map_batches(
        _sum_by_key("term", "n_occ"), batch_size=None,
        batch_format="pyarrow", zero_copy_batch=True)


def _blockwise_topk(ds: "ray.data.Dataset", val: str, key: str,
                    k: int) -> pa.Table:
    """Global top-k when each key's total lives in exactly one block:
    per-block candidates (k rows) -> driver merge of k·n_blocks rows."""
    def _cand(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        idx = pa.compute.sort_indices(batch, sort_keys=[
            (val, "descending"), (key, "ascending")])
        return batch.take(idx.slice(0, k))
    parts = ds.map_batches(_cand, batch_size=None, batch_format="pyarrow",
                           zero_copy_batch=True)
    batches = list(parts.iter_batches(batch_format="pyarrow"))
    merged = pa.concat_tables(batches) if batches else _EMPTY_COUNTS
    return merged.sort_by([(val, "descending"), (key, "ascending")]) \
        .slice(0, k)


def top_bigrams(docs: "ray.data.Dataset", k: int = 25) -> pa.Table:
    """Top-k bigrams by global count (ties: bigram ascending)."""
    return _blockwise_topk(bigram_counts(docs), "n_occ", "bigram", k)


def pmi_bigrams(docs: "ray.data.Dataset", min_count: int = 5,
                k: int = 25) -> pa.Table:
    """Top-k collocations by PMI among bigrams with >= min_count occ.

    Totals (T1, T2) are scalar aggregates; component counts arrive via
    two hash joins on the term — the vocabulary is never broadcast."""
    counts = bigram_counts(docs).materialize()
    ug = unigram_counts(docs).materialize()
    t2 = counts.sum("n_occ") or 0        # TOTAL bigram mass (pre-filter)
    t1 = ug.sum("n_occ") or 0
    bg = counts.filter(expr=f"n_occ >= {min_count}")
    if not t2 or not t1:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "n_occ": pa.array([], pa.int64()),
                         "pmi": pa.array([], pa.float64())})

    def _split(batch: pa.Table) -> pa.Table:
        grams = batch.column("bigram").to_pylist()
        a = [g.split(" ", 1)[0] for g in grams]
        b = [g.split(" ", 1)[1] for g in grams]
        # explicit types: an empty block would otherwise emit null-typed
        # term columns and break schema unification inside the join
        return pa.table({"bigram": batch.column("bigram"),
                         "n_occ": batch.column("n_occ"),
                         "term_a": pa.array(a, type=pa.string()),
                         "term_b": pa.array(b, type=pa.string())})

    from web_search_engine_ray.functions.grouping import hash_join
    bg2 = bg.map_batches(_split, batch_format="pyarrow",
                         zero_copy_batch=True)
    ua = ug.rename_columns(["term_a", "cnt_a"])
    ub = ug.rename_columns(["term_b", "cnt_b"])
    joined = hash_join(hash_join(bg2, ua, on="term_a"), ub, on="term_b")

    def _pmi(batch: pa.Table) -> pa.Table:
        c_ab = batch.column("n_occ").to_numpy().astype(np.float64)
        c_a = batch.column("cnt_a").to_numpy().astype(np.float64)
        c_b = batch.column("cnt_b").to_numpy().astype(np.float64)
        pmi = np.log((c_ab / t2) / ((c_a / t1) * (c_b / t1)))
        return pa.table({"bigram": batch.column("bigram"),
                         "n_occ": batch.column("n_occ"),
                         "pmi": pa.array(np.round(pmi, 6), pa.float64())})

    scored = joined.map_batches(_pmi, batch_format="pyarrow")
    batches = list(scored.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pa.table({"bigram": pa.array([], pa.string()),
                         "n_occ": pa.array([], pa.int64()),
                         "pmi": pa.array([], pa.float64())})
    merged = pa.concat_tables(batches)
    return merged.sort_by([("pmi", "descending"),
                           ("bigram", "ascending")]).slice(0, k)


def tfidf_keywords(docs: "ray.data.Dataset", n_docs: int,
                   k: int = 3) -> pa.Table:
    """Per-doc top-k (term, score=tf·ln(N/df)) keywords.

    tf rows (one per distinct term per doc) hash-join the df table on
    term; per-doc selection is group_topk (hash partition + vectorized
    pass).  Returns (doc_id, term, score, rank) sorted by doc, rank."""
    import pandas as pd

    from web_search_engine_ray.pipelines.window import group_topk
    from web_search_engine_ray.spec import tokenize

    def _tf(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        out_doc: list[np.ndarray] = []
        out_code: list[np.ndarray] = []
        out_tf: list[np.ndarray] = []
        all_terms: list = []
        base = 0
        for r, text in enumerate(batch.column("text").to_pylist()):
            toks = tokenize(text)
            if not toks:
                continue
            code, uniq = pd.factorize(np.asarray(toks, dtype=object))
            tf = np.bincount(code)
            out_doc.append(np.full(len(uniq), ids[r], np.int64))
            out_code.append(np.arange(len(uniq), dtype=np.int64) + base)
            out_tf.append(tf.astype(np.int64))
            all_terms.extend(uniq)
            base += len(uniq)
        if not all_terms:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        terms = np.asarray(all_terms, dtype=object)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "term": pa.array(terms[np.concatenate(out_code)], pa.string()),
            "tf": pa.array(np.concatenate(out_tf), pa.int64())})

    tf_ds = docs.select_columns(["doc_id", "text"]).map_batches(
        _tf, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _df_partial(batch: pa.Table) -> pa.Table:
        t = batch.column("term")
        counts = pa.TableGroupBy(pa.table({"term": t}), "term") \
            .aggregate([([], "count_all")])
        return pa.table({"term": counts.column("term"),
                         "n_occ": counts.column("count_all")})

    df_ds = hash_partition(
        tf_ds.select_columns(["term"]).map_batches(
            _df_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["term"]).map_batches(
            _sum_by_key("term", "n_occ"), batch_size=None,
            batch_format="pyarrow", zero_copy_batch=True) \
        .rename_columns(["term", "df"])

    from web_search_engine_ray.functions.grouping import hash_join
    joined = hash_join(tf_ds, df_ds, on="term")

    def _score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy().astype(np.float64)
        df = batch.column("df").to_numpy().astype(np.float64)
        score = np.round(tf * np.log(n_docs / df), 6)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "term": batch.column("term"),
                         "score": pa.array(score, pa.float64())})

    scored = joined.map_batches(_score, batch_format="pyarrow")
    out = group_topk(scored, key="doc_id", order_col="score", k=k,
                     id_col="term")
    return out.sort_by([("doc_id", "ascending"), ("rank", "ascending")])
