"""Pinned normative semantics (SURVEY.md Appendix A).

Every constant and formula here is load-bearing for determinism and
rank-identity (SURVEY.md A.1-A.6).  Changing anything here changes index
bytes and query results; nothing else in the engine may redefine these.

Reference parity note (SURVEY.md §0): /root/reference is empty in this
sandbox, so citations point at the driver spec (BASELINE.json) and
SURVEY.md rather than reference file:line.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass, field, asdict

# --- A.1 tokenizer -------------------------------------------------------
# tokens(text) = re.findall(r"[a-z0-9]+", text.lower())
# DuckDB oracle equivalent: regexp_extract_all(lower(text), '[a-z0-9]+')
TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize(text: str) -> list[str]:
    """The single pinned tokenizer (corpus AND queries use this)."""
    return TOKEN_RE.findall(text.lower())


# --- A.2 BM25 ------------------------------------------------------------
K1 = 1.2
B = 0.75


def idf(N: float, df: float) -> float:
    """Lucene-style non-negative idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def bm25_term(tf: float, dl: float, avgdl: float, idf_t: float) -> float:
    """Per-term BM25 contribution; float64 throughout."""
    return idf_t * tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


# --- A.3 docID -----------------------------------------------------------
# dense int64, 0-based, in (conv_id asc, turn_idx asc) order (byte-wise
# string comparison).  Implemented via conversation-level prefix sums —
# valid because turn_idx is validated dense 0..n-1 per conversation
# (web_search_engine_ray/pipelines/build.py).

# --- A.4 codec -----------------------------------------------------------
# postings sorted by doc_id; delta[0] = doc_id[0] (absolute),
# delta[i] = doc_id[i] - doc_id[i-1]; varbyte = LEB128 (7 bits/byte,
# high bit = continuation, little-endian groups); tf stream varbyte,
# no delta.  Blocks of BLOCK_SIZE postings; per block: last_doc, max_tf,
# byte offsets into both streams.  Deltas run continuously across block
# boundaries (decode is sequential per run).
BLOCK_SIZE = 128

# --- A.5 WAND ------------------------------------------------------------
# heap of k best (score, doc_id) ordered by (-score, doc_id); a pivot /
# block may be skipped only if its upper bound UB < tau.score STRICTLY
# (never skip on equality).  UB uses max_tf and dl_min (corpus minimum
# doc length, from stats).  See web_search_engine_ray/stages/scorer.py.

# Reserved pseudo-term: the doc-length table stored AS a posting list
# (doc_ids -> tf = doc_len), emitted by A1 alongside real postings and
# merged/salted by the same machinery.  '\x00' cannot appear in real
# tokens ([a-z0-9]+), and the sentinel sorts before every real term.
DL_SENTINEL = "\x00dl"

# --- A.6 determinism: stable hashing (never Python hash()) ---------------


def stable_hash64(s: str | bytes) -> int:
    """First 8 bytes of sha1, big-endian unsigned. Process-independent."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.sha1(s).digest()[:8], "big")


def term_bucket(term: str, num_buckets: int) -> int:
    return stable_hash64(term) % num_buckets


def derive_seed(*parts: int | str) -> int:
    """Deterministic sub-seed from (global_seed, partition ids...)."""
    h = hashlib.sha1("/".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big")


# --- engine configuration (recorded in stats T5; part of config hash) ----


@dataclass(frozen=True)
class EngineConfig:
    num_buckets: int = 64          # merge-shuffle partitions (sha1(term) % B)
    salt_s: int = 8                # doc-range salts for hot terms (SURVEY §4.3)
    hot_df_ratio: float = 0.01     # sample df / sample docs above which a term is "hot"
    hot_sample_docs: int = 50_000  # deterministic sample size for hot-term detection
    block_size: int = BLOCK_SIZE
    k1: float = K1
    b: float = B
    tokenize_batch_size: int = 8192
    checkpoint_partials: bool = True
    materialize_partials: bool = True  # False at extreme scale: stream to ckpt, re-read
    indexer_actor_pool: bool = False   # True: A1 as an actor pool (long-lived builds)
    merge_strategy: str = "direct"     # "direct" (raw-task exchange) | "hash_shuffle"
    layout_version: int = 2            # bumped when on-disk layout changes
    # docID assignment: driver-side conv reduce below this row count (a
    # pure fast path), distributed sort + prefix-sum + hash join above it
    docid_small_input_rows: int = 20_000_000
    docid_distributed: bool = False    # True: force the distributed path
    # run doc_table write CONCURRENTLY with tokenize+merge, and the
    # partials checkpoint write concurrently with the merge (fresh
    # plain-path builds only; outputs byte-identical — scheduling only)
    overlap_build_stages: bool = True
    # fuse the doc_table write INTO the tokenize pass (one corpus scan,
    # one stream through memory): each indexer task writes its block's
    # doc_table shard as an atomic side-effect and emits posting runs —
    # removes a full corpus write+read round-trip (zstd encode+decode,
    # parquet encode+decode) from the critical path AND from the memory
    # bus, which is the binding resource at high parallelism.  Same
    # doc_table rows / byte-identical segments (pinned by test); only
    # the shard file naming differs.  Fresh overlapped builds only.
    fuse_doc_table: bool = True

    def config_hash(self) -> str:
        payload = repr(sorted(asdict(self).items())).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


DEFAULT_CONFIG = EngineConfig()
