"""Open-addressing pair->rank hash table, HBM-resident.

The reference holds merge ranks in a ``hashbrown::HashMap<(u32,u32),usize>``
probed once per adjacent pair per merge-loop iteration (bpe.rs:127-153).
On TPU the same role is played by three dense int32 arrays (key_a, key_b,
rank) probed with linear probing: each probe step is one vectorized gather
over the whole batch.  Built on host with numpy; the probe uses identical
uint32 mixing on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["PairHashTable", "build_pair_table", "INF_RANK"]

INF_RANK = np.int32(0x3FFFFFFF)

_MUL_A = np.uint32(0x85EBCA6B)
_MUL_B = np.uint32(0xC2B2AE35)
_MIX = np.uint32(0x27D4EB2F)


def _mix_hash_np(a: np.ndarray, b: np.ndarray, mask: int) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint32 wraparound is the point
        a = np.asarray(a, np.uint64) & np.uint64(0xFFFFFFFF)
        b = np.asarray(b, np.uint64) & np.uint64(0xFFFFFFFF)
        M = np.uint64(0xFFFFFFFF)
        h = ((a * np.uint64(int(_MUL_A))) & M) ^ ((b * np.uint64(int(_MUL_B))) & M)
        h = h ^ (h >> np.uint64(15))
        h = (h * np.uint64(int(_MIX))) & M
        h = h ^ (h >> np.uint64(13))
        return (h & np.uint64(mask)).astype(np.int32)


def mix_hash_jnp(a, b, mask: int):
    """Device-side twin of :func:`_mix_hash_np` (bit-identical)."""
    import jax.numpy as jnp

    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    h = (a * _MUL_A) ^ (b * _MUL_B)
    h = h ^ (h >> np.uint32(15))
    h = h * _MIX
    h = h ^ (h >> np.uint32(13))
    return (h & np.uint32(mask)).astype(jnp.int32)


@dataclass
class PairHashTable:
    key_a: np.ndarray  # [T] int32, -1 = empty
    key_b: np.ndarray  # [T] int32
    rank: np.ndarray  # [T] int32
    size: int  # T (power of two)
    max_probes: int


def build_pair_table(
    merge_ranks: dict[tuple[int, int], int], min_load_shift: int = 2
) -> PairHashTable:
    """Insert all pairs with linear probing; grows until max probe <= 16."""
    n = max(len(merge_ranks), 1)
    size = 1
    while size < n << min_load_shift:
        size <<= 1
    while True:
        key_a = np.full(size, -1, dtype=np.int32)
        key_b = np.full(size, -1, dtype=np.int32)
        rank = np.full(size, INF_RANK, dtype=np.int32)
        mask = size - 1
        max_probes = 0
        ok = True
        for (a, b), r in merge_ranks.items():
            h = int(_mix_hash_np(np.uint32(a), np.uint32(b), mask))
            probes = 1
            while key_a[h] != -1:
                h = (h + 1) & mask
                probes += 1
                if probes > 64:
                    ok = False
                    break
            if not ok:
                break
            key_a[h] = a
            key_b[h] = b
            rank[h] = r
            max_probes = max(max_probes, probes)
        if ok and max_probes <= 16:
            return PairHashTable(key_a, key_b, rank, size, max_probes)
        size <<= 1


def lookup_ranks_jnp(table_arrays, max_probes: int, size: int, a, b, valid):
    """Vectorized rank lookup: INF_RANK where absent or ~valid.

    ``table_arrays`` = (key_a, key_b, rank) jnp arrays; ``a``/``b`` int32
    arrays of any shape; one gather per probe step.
    """
    import jax.numpy as jnp

    key_a, key_b, rank_arr = table_arrays
    mask = size - 1
    h = mix_hash_jnp(a, b, mask)
    out = jnp.full(a.shape, INF_RANK, dtype=jnp.int32)
    found = jnp.zeros(a.shape, dtype=bool)
    for j in range(max_probes):
        idx = (h + j) & mask
        ka = key_a[idx]
        kb = key_b[idx]
        hit = (ka == a) & (kb == b) & ~found
        out = jnp.where(hit, rank_arr[idx], out)
        found = found | hit | (ka == -1)
    return jnp.where(valid, out, INF_RANK)
