"""Pins hash_partition's complete-key-groups-per-block contract.

Every grouped operator built on functions/grouping.py (dedup
first-rows, LSH bucket pairing, sessionize, window aggregates) silently
MISSES results if a key's rows ever straddle two blocks.  Ray 2.49's
hash shuffle emits one block per partition and does not split oversized
partitions at target_max_block_size; this test makes that a loud
contract instead of an assumption — if a Ray upgrade starts splitting,
this fails before any operator quietly drops pairs.
"""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from web_search_engine_ray.functions.grouping import hash_partition


def _key_to_batches(ds, col):
    seen = {}
    n_batches = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        n_batches += 1
        for k in np.unique(b.column(col).to_numpy()):
            seen.setdefault(int(k), []).append(n_batches)
    return seen, n_batches


def test_key_groups_never_straddle_blocks(ray_session):
    """Hot key ~6x over target_max_block_size + many partitions: every
    key must still appear in exactly one per-block batch."""
    n = 300_000
    rng = np.random.default_rng(7)
    keys = np.r_[np.zeros(n // 2, np.int64),            # one hot key
                 rng.integers(1, 5_000, n // 2)]        # long tail
    tbl = pa.table({"k": pa.array(keys),
                    "v": pa.array(rng.integers(0, 100, n))})
    ds = ray.data.from_arrow(tbl).repartition(num_blocks=16).materialize()
    # force the splitting pressure the contract must survive: the hot
    # partition is several MB, the target a fraction of that
    ds.context.target_max_block_size = 256 * 1024
    out = hash_partition(ds, ["k"], num_partitions=32)
    seen, n_batches = _key_to_batches(out, "k")
    straddlers = {k: v for k, v in seen.items() if len(v) > 1}
    assert not straddlers, (
        f"{len(straddlers)} keys straddle blocks (e.g. "
        f"{list(straddlers.items())[:3]}) — hash_partition's contract "
        f"is broken in this Ray version; every grouped operator built "
        f"on it is now incorrect")
    assert n_batches == 32


def test_all_rows_survive_the_shuffle(ray_session):
    """Row conservation under the same pressure (no silent drops)."""
    n = 120_000
    rng = np.random.default_rng(11)
    tbl = pa.table({"k": pa.array(rng.integers(0, 37, n)),
                    "v": pa.array(np.arange(n, dtype=np.int64))})
    ds = ray.data.from_arrow(tbl).repartition(num_blocks=8).materialize()
    ds.context.target_max_block_size = 128 * 1024
    out = hash_partition(ds, ["k"], num_partitions=16)
    got = sum(b.num_rows
              for b in out.iter_batches(batch_size=None,
                                        batch_format="pyarrow"))
    assert got == n
