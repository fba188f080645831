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

__all__ = [
    "PairHashTable",
    "build_pair_table",
    "INF_RANK",
    "QcTable",
    "build_qc_table",
    "qc_lookup_jnp",
]

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


@dataclass
class ChdTable:
    """Perfect-hash (compress-hash-displace) pair table: exactly one slot
    probe per lookup.

    slot = (mix2(a,b) + disp[mix1(a,b) & (B-1)]) & (T-1); the row table
    packs (key_a, key_b, rank, 0) so verification + rank need a single
    row gather plus the displacement gather — 2 gathers total vs
    3 x max_probes for linear probing.  Chosen because data-dependent
    gathers are the dominant per-iteration cost of the merge kernel.
    """

    disp: np.ndarray  # [B] int32 displacements
    rows: np.ndarray  # [T, 4] int32: key_a, key_b, rank, 0 (-1 keys empty)
    size: int  # T (power of two)
    n_buckets: int  # B (power of two)


def build_chd_table(
    merge_ranks: dict[tuple[int, int], int],
    merge_ops: dict | None = None,
    load: float = 0.7,
) -> ChdTable | None:
    """Construct a CHD perfect hash; None if construction fails.

    ``merge_ops`` maps rank -> ((a, b), new_id); the minted id is packed
    into row column 3 so the merge kernel resolves (rank, new_id) with one
    row gather.
    """
    n = max(len(merge_ranks), 1)
    size = 1
    while size * load < n:
        size <<= 1
    for _ in range(7):  # grow on failure (same-bucket same-base-slot keys
        # are fatal at a given size but resolve under a wider mask)
        t = _try_build_chd(merge_ranks, merge_ops or {}, size)
        if t is not None:
            return t
        size <<= 1
    return None


def _try_build_chd(merge_ranks, merge_ops, size: int) -> ChdTable | None:
    mask = size - 1
    n_buckets = max(size // 4, 1)
    bmask = n_buckets - 1
    if not merge_ranks:
        rows = np.full((size, 4), -1, dtype=np.int32)
        rows[:, 2] = INF_RANK
        return ChdTable(np.zeros(n_buckets, np.int32), rows, size, n_buckets)

    keys = np.array(list(merge_ranks.keys()), dtype=np.int64)  # [n, 2]
    ranks = np.array(list(merge_ranks.values()), dtype=np.int32)
    new_ids = np.array(
        [merge_ops.get(int(r), ((0, 0), -1))[1] for r in ranks], dtype=np.int32
    )
    a = keys[:, 0].astype(np.uint32)
    b = keys[:, 1].astype(np.uint32)
    h1 = _mix_hash_np(a, b, bmask)  # bucket
    # second, independent mix for the base slot
    with np.errstate(over="ignore"):
        M = np.uint64(0xFFFFFFFF)
        g = (
            (a.astype(np.uint64) * np.uint64(0x9E3779B1)) & M
        ) ^ ((b.astype(np.uint64) * np.uint64(0x7FEB352D)) & M)
        g = g ^ (g >> np.uint64(16))
        g = (g * np.uint64(0x45D9F3B)) & M
        h2 = (g & np.uint64(mask)).astype(np.int64)

    order = np.argsort(h1, kind="stable")
    h1s = h1[order]
    boundaries = np.flatnonzero(np.diff(h1s)) + 1
    groups = np.split(order, boundaries)
    groups.sort(key=len, reverse=True)

    taken = np.zeros(size, dtype=bool)
    disp = np.zeros(n_buckets, np.int32)
    rows = np.full((size, 4), -1, dtype=np.int32)
    rows[:, 2] = INF_RANK
    for grp in groups:
        base = h2[grp]
        placed = False
        for d in range(size):
            pos = (base + d) & mask
            if len(grp) > 1 and len(np.unique(pos)) != len(grp):
                continue
            if not taken[pos].any():
                taken[pos] = True
                disp[h1[grp[0]]] = d
                rows[pos, 0] = a[grp].astype(np.int32)
                rows[pos, 1] = b[grp].astype(np.int32)
                rows[pos, 2] = ranks[grp]
                rows[pos, 3] = new_ids[grp]
                placed = True
                break
        if not placed:
            return None
    return ChdTable(disp, rows, size, n_buckets)


@dataclass
class QcTable:
    """Two-choice cuckoo pair table with packed u32 rows: each lookup is
    two INDEPENDENT [m, 2]-row gathers (round-4 merge-kernel redesign).

    Row = (key ``a << 16 | b``, value ``rank << 16 | minted_id``).  The
    CHD form's two gathers are serially dependent (displacement feeds
    the row address) and pull 5 elements/lane; the cuckoo probes have no
    data dependence between them, so they overlap on-chip.  Measured on
    a v5e chip at the production [1024, 128] pack (scripts/kernel_exp.py,
    PROFILE.md round 4): 1.94 -> 1.26 ms per fixpoint iteration.  A
    quotient-compressed 1-element-per-slot variant was also measured and
    is SLOWER (2.69 ms/iter) — flat 1-D scalar gathers lower worse on
    this backend than small row gathers, so the full key stays in the
    row and no affine-minted-id restriction is needed.

    Eligibility: token ids < 65535 and ranks/minted ids < 65536 (u16
    packing).  Anything else falls back to :class:`ChdTable`.
    """

    t1: np.ndarray  # [m, 2] u32: key, rank<<16|minted (0xFFFFFFFF empty)
    t2: np.ndarray  # [m, 2] u32
    size: int  # m (power of two)


def build_qc_table(
    merge_ranks: dict[tuple[int, int], int], merge_ops: dict
) -> QcTable | None:
    """Cuckoo build (random-walk insertion, hashes precomputed
    vectorized); None if ineligible — the caller keeps the CHD
    fallback."""
    n = len(merge_ranks)
    if n == 0:
        return None
    keys = list(merge_ranks.keys())
    a_arr = np.array([k[0] for k in keys], np.int64)
    b_arr = np.array([k[1] for k in keys], np.int64)
    # ranks are sparse (skipped merges keep original enumeration indices,
    # core/bpe.py build_merge_tables) — u16 packing needs the MAX rank
    # in range, not just the count.  ALL ids (pair elements AND minted)
    # capped below 0xFFFF: a runtime-adjacent pair (65535, 65535) would
    # pack to 0xFFFFFFFF, the empty-slot sentinel, and false-hit on any
    # empty slot; qc_lookup_jnp also masks the sentinel as a second line
    # of defense (ids outside every merge pair can still reach 0xFFFF).
    max_rank = max(merge_ranks.values())
    minted = [merge_ops[r][1] for r in merge_ranks.values()]
    if (
        a_arr.min() < 0
        or b_arr.min() < 0
        or a_arr.max() >= 0xFFFF
        or b_arr.max() >= 0xFFFF
        or max_rank >= 0x10000
        or max(minted) >= 0xFFFF
        or min(minted) < 0
    ):
        return None
    m = 64
    while m * 2 * 0.45 < n:
        m <<= 1
    k32 = ((a_arr << 16) | b_arr).astype(np.uint32)
    vals = [
        (merge_ranks[k] << 16) | merge_ops[merge_ranks[k]][1] for k in keys
    ]
    for _ in range(4):
        mask = m - 1
        h1 = _mix_hash_np(
            a_arr.astype(np.uint32), b_arr.astype(np.uint32), mask
        ).tolist()
        M = np.uint64(0xFFFFFFFF)
        g = (
            (a_arr.astype(np.uint64) * np.uint64(0x9E3779B1)) & M
        ) ^ ((b_arr.astype(np.uint64) * np.uint64(0x7FEB352D)) & M)
        g = g ^ (g >> np.uint64(16))
        g = (g * np.uint64(0x45D9F3B)) & M
        h2 = (g & np.uint64(mask)).astype(np.int64).tolist()
        slots_of = {int(k32[i]): (h1[i], h2[i]) for i in range(n)}
        val_of = {int(k32[i]): vals[i] for i in range(n)}
        occ0: list = [None] * m
        occ1: list = [None] * m
        ok = True
        for k in slots_of:
            cur, side = k, 0
            for _ in range(500):
                p1, p2 = slots_of[cur]
                pos = p1 if side == 0 else p2
                occ = occ0 if side == 0 else occ1
                cur, occ[pos] = occ[pos], cur
                if cur is None:
                    break
                side = 1 - side
            if cur is not None:
                ok = False
                break
        if ok:
            t = np.full((2, m, 2), 0xFFFFFFFF, dtype=np.uint32)
            for side, occ in ((0, occ0), (1, occ1)):
                for pos, k in enumerate(occ):
                    if k is not None:
                        t[side, pos, 0] = k
                        t[side, pos, 1] = val_of[k]
            return QcTable(t[0], t[1], m)
        m <<= 1
    return None  # walk failed repeatedly (vanishingly rare)


def qc_lookup_jnp(t1, t2, size: int, a, b, valid):
    """(rank, minted) via the cuckoo table: 2 INDEPENDENT row gathers
    (vs the CHD form's serial displacement->row chain)."""
    import jax.numpy as jnp

    k = (a.astype(jnp.uint32) << 16) | b.astype(jnp.uint32)
    # a pair packing to the empty-slot sentinel (65535, 65535) must never
    # match: empty slots hold key 0xFFFFFFFF (ADVICE r4 high finding)
    valid = valid & (k != np.uint32(0xFFFFFFFF))
    p1 = mix_hash_jnp(a, b, size - 1)
    p2 = mix_hash2_jnp(a, b, size - 1)
    r1 = t1[p1]  # [..., 2] — independent of r2: the probes overlap
    r2 = t2[p2]
    hit1 = (r1[..., 0] == k) & valid
    hit2 = (r2[..., 0] == k) & valid
    rm = jnp.where(hit1, r1[..., 1], r2[..., 1])
    hit = hit1 | hit2
    rank = jnp.where(hit, (rm >> np.uint32(16)).astype(jnp.int32), INF_RANK)
    minted = (rm & np.uint32(0xFFFF)).astype(jnp.int32)
    return rank, minted


def mix_hash2_jnp(a, b, mask: int):
    """Device twin of the CHD base-slot mix (bit-identical)."""
    import jax.numpy as jnp

    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    g = (a * np.uint32(0x9E3779B1)) ^ (b * np.uint32(0x7FEB352D))
    g = g ^ (g >> np.uint32(16))
    g = g * np.uint32(0x45D9F3B)
    return (g & np.uint32(mask)).astype(jnp.int32)


def chd_lookup_jnp(disp, rows, size: int, n_buckets: int, a, b, valid):
    """Rank lookup via the CHD table: 2 gathers."""
    import jax.numpy as jnp

    bucket = mix_hash_jnp(a, b, n_buckets - 1)
    d = disp[bucket]
    pos = (mix_hash2_jnp(a, b, size - 1) + d) & (size - 1)
    row = rows[pos]  # [..., 4]
    hit = (row[..., 0] == a) & (row[..., 1] == b) & valid
    return jnp.where(hit, row[..., 2], INF_RANK)


def chd_lookup_rows_jnp(disp, rows, size: int, n_buckets: int, a, b, valid):
    """(rank, new_id) lookup via the CHD table: 2 gathers total."""
    import jax.numpy as jnp

    bucket = mix_hash_jnp(a, b, n_buckets - 1)
    d = disp[bucket]
    pos = (mix_hash2_jnp(a, b, size - 1) + d) & (size - 1)
    row = rows[pos]  # [..., 4]
    hit = (row[..., 0] == a) & (row[..., 1] == b) & valid
    rank = jnp.where(hit, row[..., 2], INF_RANK)
    new_id = row[..., 3]
    return rank, new_id


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
