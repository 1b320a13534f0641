"""Varbyte/delta posting codec + block-max metadata (SURVEY.md A.4).

Numpy-vectorized LEB128: 7 bits per byte, high bit = continuation,
little-endian groups.  Postings are sorted doc_ids stored as deltas
(first value absolute, deltas run continuously across block boundaries)
plus a parallel tf stream (varbyte, no delta).  Every BLOCK_SIZE
postings form a block with (last_doc, max_tf, byte offsets) metadata —
the substrate for block-max WAND (SURVEY.md A.5).

`concat_runs` splices doc-range-sharded runs of the same term (the
skew-salting path, SURVEY.md §4.3) in O(1) bytes per boundary: only the
first varint of each subsequent run is rewritten from absolute to delta.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from web_search_engine_ray.spec import BLOCK_SIZE

_POW7 = np.array([1 << (7 * k) for k in range(10)], dtype=np.uint64)


def varbyte_nbytes(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (uint64 input, values < 2^63) —
    one digitize pass instead of 10 compare passes."""
    v = values.astype(np.uint64, copy=False)
    if len(v) == 0:
        return np.empty(0, dtype=np.int64)
    # nb = index of first power-of-128 ABOVE v  (1..10)
    return np.digitize(v, _POW7[1:], right=False).astype(np.int64) + 1


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized LEB128 encode of a uint64/int64 array."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    nb = varbyte_nbytes(v)
    total = int(nb.sum())
    out = np.empty(total, dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    maxb = int(nb.max())
    for j in range(maxb):
        mask = nb > j
        chunk = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = chunk | cont
    return out.tobytes()


def varbyte_decode(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Vectorized LEB128 decode -> uint64 array.

    Byte-position masked passes (j = 0..maxlen-1) instead of
    repeat + add.reduceat: reduceat over tens of millions of 1-2 byte
    segments ran at ~3M vals/s; this form is one gather per byte
    position actually present (~50M+ vals/s on 1-byte-dominated
    streams).  Single-byte streams take a memcpy-speed fast path."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = b < 128
    if is_end.all():                          # all values < 128
        out = b.astype(np.uint64)
        if count is not None and len(out) != count:
            raise ValueError(f"decoded {len(out)} values, expected {count}")
        return out
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    np.add(ends[:-1], 1, out=starts[1:])
    lengths = ends - starts + 1
    out = np.zeros(len(ends), dtype=np.uint64)
    maxlen = int(lengths.max())
    for j in range(maxlen):
        m = lengths > j if j else slice(None)
        idx = starts[m] + j
        out[m] |= (b[idx].astype(np.uint64) & np.uint64(0x7F)) \
            << np.uint64(7 * j)
    if count is not None and len(out) != count:
        raise ValueError(f"decoded {len(out)} values, expected {count}")
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """d[0]=x[0] absolute; d[i]=x[i]-x[i-1] (>0 for strictly sorted ids)."""
    x = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    d = np.empty_like(x)
    if len(x):
        d[0] = x[0]
        np.subtract(x[1:], x[:-1], out=d[1:])
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.int64, copy=False))


@dataclass
class EncodedPostings:
    """One term's encoded posting run (a full list, or one salt shard)."""

    n: int                       # number of postings
    first_doc: int
    last_doc: int
    doc_bytes: bytes             # varbyte(delta(doc_ids)), continuous deltas
    tf_bytes: bytes              # varbyte(tfs), same order
    block_last_doc: np.ndarray   # int64[n_blocks]
    block_max_tf: np.ndarray     # int32[n_blocks]
    block_off_docs: np.ndarray   # int64[n_blocks] byte offset of block start
    block_off_tfs: np.ndarray    # int64[n_blocks]
    max_tf: int                  # global max tf (term upper bound)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray,
                    block_size: int = BLOCK_SIZE) -> EncodedPostings:
    """Encode one term's (sorted, unique doc_ids; parallel tfs)."""
    n = len(doc_ids)
    assert n > 0
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    deltas = delta_encode(doc_ids)
    nb_docs = varbyte_nbytes(deltas.astype(np.uint64))
    nb_tfs = varbyte_nbytes(tfs.astype(np.uint64))
    doc_bytes = varbyte_encode(deltas)
    tf_bytes = varbyte_encode(tfs)
    # block boundaries
    bstarts = np.arange(0, n, block_size, dtype=np.int64)
    bends = np.minimum(bstarts + block_size, n)
    cum_docs = np.concatenate(([0], np.cumsum(nb_docs)))
    cum_tfs = np.concatenate(([0], np.cumsum(nb_tfs)))
    block_last_doc = doc_ids[bends - 1]
    block_max_tf = np.maximum.reduceat(tfs, bstarts).astype(np.int32)
    return EncodedPostings(
        n=n,
        first_doc=int(doc_ids[0]),
        last_doc=int(doc_ids[-1]),
        doc_bytes=doc_bytes,
        tf_bytes=tf_bytes,
        block_last_doc=block_last_doc,
        block_max_tf=block_max_tf,
        block_off_docs=cum_docs[bstarts],
        block_off_tfs=cum_tfs[bstarts],
        max_tf=int(tfs.max()),
    )


def decode_postings(doc_bytes: bytes, tf_bytes: bytes, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Full decode -> (doc_ids int64, tfs int64)."""
    doc_ids = delta_decode(varbyte_decode(doc_bytes, n).astype(np.int64))
    tfs = varbyte_decode(tf_bytes, n).astype(np.int64)
    return doc_ids, tfs


def encode_runs(doc_ids: np.ndarray, tfs: np.ndarray, starts: np.ndarray,
                ends: np.ndarray, block_size: int = BLOCK_SIZE) -> dict:
    """Encode MANY doc-sorted posting runs in one vectorized pass.

    Input is a term-major batch layout: ``doc_ids``/``tfs`` sorted by
    (run, doc_id) with run r occupying [starts[r], ends[r]).  This is
    the A1 fast path: one varbyte pass over the whole batch instead of
    one encode call per term, so per-batch mini posting lists cost
    ~O(postings) regardless of vocabulary size, and the merge shuffle
    moves ~2 B/posting instead of ~25 B/posting of raw rows.

    Returns aligned per-run columns: doc_bytes, tf_bytes (list[bytes]),
    n, first_doc, last_doc, max_tf, cf (np arrays), block_last_doc,
    block_max_tf, block_off_docs, block_off_tfs (list[list]).
    """
    n_runs = len(starts)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    # deltas, absolute at each run start
    d = np.empty_like(doc_ids)
    if len(doc_ids):
        d[1:] = doc_ids[1:] - doc_ids[:-1]
    d[starts] = doc_ids[starts]
    in_run = np.ones(len(doc_ids), dtype=bool)
    in_run[starts] = False
    if (d[in_run] <= 0).any():
        raise ValueError("duplicate or unsorted doc_id within a run — "
                         "run exact dedup (D1) before indexing")
    nb_d = varbyte_nbytes(d.astype(np.uint64))
    doc_buf = varbyte_encode(d)
    nb_t = varbyte_nbytes(tfs.astype(np.uint64))
    tf_buf = varbyte_encode(tfs)
    cum_d = np.concatenate(([0], np.cumsum(nb_d)))
    cum_t = np.concatenate(([0], np.cumsum(nb_t)))
    counts = ends - starts
    cf = np.add.reduceat(tfs, starts) if len(tfs) else np.empty(0, np.int64)
    max_tf = (np.maximum.reduceat(tfs, starts) if len(tfs)
              else np.empty(0, np.int64))
    doc_bytes: list[bytes] = []
    tf_bytes: list[bytes] = []
    bl_last: list[list] = []
    bl_max: list[list] = []
    bl_offd: list[list] = []
    bl_offt: list[list] = []
    mv_d = memoryview(doc_buf)
    mv_t = memoryview(tf_buf)
    for r in range(n_runs):
        s, e = int(starts[r]), int(ends[r])
        doc_bytes.append(bytes(mv_d[cum_d[s]:cum_d[e]]))
        tf_bytes.append(bytes(mv_t[cum_t[s]:cum_t[e]]))
        if counts[r] <= block_size:
            bl_last.append([int(doc_ids[e - 1])])
            bl_max.append([int(max_tf[r])])
            bl_offd.append([0])
            bl_offt.append([0])
        else:  # rare within one batch (hot terms) — exact per-block meta
            bstarts = np.arange(s, e, block_size)
            bends = np.minimum(bstarts + block_size, e)
            bl_last.append(doc_ids[bends - 1].tolist())
            bl_max.append(np.maximum.reduceat(tfs[s:e], bstarts - s).tolist())
            bl_offd.append((cum_d[bstarts] - cum_d[s]).tolist())
            bl_offt.append((cum_t[bstarts] - cum_t[s]).tolist())
    return {
        "doc_bytes": doc_bytes, "tf_bytes": tf_bytes,
        "n": counts.astype(np.int64),
        "first_doc": doc_ids[starts] if len(doc_ids) else np.empty(0, np.int64),
        "last_doc": doc_ids[ends - 1] if len(doc_ids) else np.empty(0, np.int64),
        "max_tf": max_tf, "cf": cf,
        "block_last_doc": bl_last, "block_max_tf": bl_max,
        "block_off_docs": bl_offd, "block_off_tfs": bl_offt,
    }


def _first_varint_len(buf: bytes) -> int:
    i = 0
    while buf[i] >= 128:
        i += 1
    return i + 1


def concat_runs(runs: list[EncodedPostings],
                block_size: int = BLOCK_SIZE) -> EncodedPostings:
    """Concatenate doc-range-disjoint sorted runs of ONE term.

    Runs must be in ascending doc-range order (salt = doc-range index,
    SURVEY.md §4.3), i.e. runs[i].last_doc < runs[i+1].first_doc.  Each
    run's first varint is absolute; for every run after the first it is
    rewritten as a delta from the previous run's last_doc — all other
    bytes (and therefore all block offsets, shifted) are reused as-is.
    """
    if len(runs) == 1:
        return runs[0]
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    bl_last, bl_maxtf, bl_offd, bl_offt = [], [], [], []
    doc_off = 0
    tf_off = 0
    prev_last = None
    for r in runs:
        if prev_last is None:
            part = r.doc_bytes
            shift = 0
        else:
            if r.first_doc <= prev_last:
                raise ValueError("runs overlap or out of order")
            old_len = _first_varint_len(r.doc_bytes)
            patched = varbyte_encode(
                np.array([r.first_doc - prev_last], dtype=np.uint64))
            part = patched + r.doc_bytes[old_len:]
            shift = len(patched) - old_len
        doc_parts.append(part)
        tf_parts.append(r.tf_bytes)
        bl_last.append(r.block_last_doc)
        bl_maxtf.append(r.block_max_tf)
        # first block of this run starts at doc_off; later blocks shift too
        bl_offd.append(r.block_off_docs + doc_off + np.where(
            np.arange(len(r.block_off_docs)) == 0, 0, shift))
        bl_offt.append(r.block_off_tfs + tf_off)
        doc_off += len(part)
        tf_off += len(r.tf_bytes)
        prev_last = r.last_doc
    return EncodedPostings(
        n=sum(r.n for r in runs),
        first_doc=runs[0].first_doc,
        last_doc=runs[-1].last_doc,
        doc_bytes=b"".join(doc_parts),
        tf_bytes=b"".join(tf_parts),
        block_last_doc=np.concatenate(bl_last),
        block_max_tf=np.concatenate(bl_maxtf),
        block_off_docs=np.concatenate(bl_offd),
        block_off_tfs=np.concatenate(bl_offt),
        max_tf=max(r.max_tf for r in runs),
    )
