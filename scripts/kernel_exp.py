#!/usr/bin/env python
"""Merge-kernel lookup-scheme experiments on the real chip (round 4).

Times the per-iteration marginal cost of the merge fixpoint body under
different pair->(rank, minted) table schemes, at the production
[1024, 128] pack shape with the real 50K-vocab bench tables:

  chd4     current production: disp gather + [T,4] i32 row gather (serial)
  chd2     disp gather + packed [T,2] u32 rows (keyab, rank<<16|minted)
  cuckoo2  two-choice cuckoo: 2 independent [m,2] u32 gathers (parallel)
  *_g      gathers-only bound for each scheme (fake ranks from gathered
           values, no scans)
  scans    scans-only bound (fake computed ranks, no gathers)

Marginal cost/iter = (t(K=24) - t(K=4)) / 20, honest D2H sync.

Usage: python scripts/kernel_exp.py  (needs the chip; run alone)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from complexity_tokenizer_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp

from complexity_tokenizer_tpu.ops.hashtable import (
    INF_RANK,
    mix_hash_jnp,
    mix_hash2_jnp,
)
from complexity_tokenizer_tpu.ops.merge import (
    _carry_first,
    _carry_last,
    _shift_left,
    _shift_right,
)

B, W = 1024, 128


def load_tables():
    from complexity_tokenizer_tpu.tokenizer import Tokenizer

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache",
        "bench_tokenizer_r3_50k.json",
    )
    tok = Tokenizer.from_file(path)
    return tok


def build_cuckoo(merge_ranks, merge_ops):
    """2-table cuckoo with packed u32 rows; returns (t1, t2, m).

    Hashes precomputed vectorized; random-walk insertion runs on plain
    Python ints with a key->slots dict (no numpy scalars in the loop)."""
    from complexity_tokenizer_tpu.ops.hashtable import _mix_hash_np

    n = len(merge_ranks)
    m = 1
    while m * 2 * 0.45 < n:
        m <<= 1
    minted_of = {r: op[1] for r, op in merge_ops.items()}
    keys = list(merge_ranks.keys())
    a_np = np.array([k[0] for k in keys], np.uint32)
    b_np = np.array([k[1] for k in keys], np.uint32)
    for _ in range(4):
        mask = m - 1
        h1 = _mix_hash_np(a_np, b_np, mask).tolist()
        M = np.uint64(0xFFFFFFFF)
        g = (
            (a_np.astype(np.uint64) * np.uint64(0x9E3779B1)) & M
        ) ^ ((b_np.astype(np.uint64) * np.uint64(0x7FEB352D)) & M)
        g = g ^ (g >> np.uint64(16))
        g = (g * np.uint64(0x45D9F3B)) & M
        h2 = (g & np.uint64(mask)).astype(np.int64).tolist()
        slots_of = {}
        val_of = {}
        for i, (a, b) in enumerate(keys):
            k32 = (a << 16) | b
            r = merge_ranks[(a, b)]
            slots_of[k32] = (h1[i], h2[i])
            val_of[k32] = (r << 16) | minted_of[r]
        # occupant[side][pos] = key or None
        occ0 = [None] * m
        occ1 = [None] * m
        ok = True
        for k32 in slots_of:
            cur, side = k32, 0
            for _ in range(200):
                p1, p2 = slots_of[cur]
                pos = p1 if side == 0 else p2
                occ = occ0 if side == 0 else occ1
                prev = occ[pos]
                occ[pos] = cur
                if prev is None:
                    cur = None
                    break
                cur, side = prev, 1 - side
            if cur is not None:
                ok = False
                break
        if ok:
            t = np.full((2, m, 2), 0xFFFFFFFF, dtype=np.uint32)
            for side, occ in ((0, occ0), (1, occ1)):
                for pos, k32 in enumerate(occ):
                    if k32 is not None:
                        t[side, pos, 0] = k32
                        t[side, pos, 1] = val_of[k32]
            return t[0], t[1], m
        m <<= 1
    raise RuntimeError("cuckoo build failed")


def pack_chd2(rows):
    """[T,4] i32 (a,b,rank,minted) -> [T,2] u32 (a<<16|b, rank<<16|minted)."""
    a = rows[:, 0].astype(np.int64)
    b = rows[:, 1].astype(np.int64)
    r = rows[:, 2].astype(np.int64)
    mi = rows[:, 3].astype(np.int64)
    empty = a < 0
    keyab = np.where(empty, 0xFFFFFFFF, (a << 16) | b).astype(np.uint32)
    rm = np.where(empty, 0xFFFFFFFF, (np.minimum(r, 0xFFFF) << 16) | (mi & 0xFFFF)).astype(
        np.uint32
    )
    return np.stack([keyab, rm], axis=1)


def make_body(lookup, with_scans=True):
    """Generic fixpoint body parameterized by the (r, minted) lookup."""

    def body(i, t):
        alive = t >= 0
        if with_scans:
            tn_incl = _carry_first(t, alive, 1)
            t_next = _shift_left(tn_incl, jnp.int32(-1))
        else:
            t_next = _shift_left(t, jnp.int32(-1))
        pair_valid = alive & (t_next >= 0)
        r, minted = lookup(t, t_next, pair_valid)
        if not with_scans:
            # gathers-only bound: consume r/minted without scans
            return jnp.where(r < 100, minted, t)
        rowmin = jnp.min(r, axis=1, keepdims=True)
        is_best = (r == rowmin) & (rowmin < INF_RANK) & pair_valid
        prev_best = _shift_right(_carry_last(is_best, alive, 1), False)
        selected = is_best & ~prev_best
        t2 = jnp.where(selected, minted, t)
        killed = alive & _shift_right(_carry_last(selected, alive, 1), False)
        t2 = jnp.where(killed, -1, t2)
        return t2

    return body


def lookup_chd4(disp, rows, size, n_buckets):
    def f(a, b, valid):
        bucket = mix_hash_jnp(a, b, n_buckets - 1)
        d = disp[bucket]
        pos = (mix_hash2_jnp(a, b, size - 1) + d) & (size - 1)
        row = rows[pos]
        hit = (row[..., 0] == a) & (row[..., 1] == b) & valid
        return jnp.where(hit, row[..., 2], INF_RANK), row[..., 3]

    return f


def lookup_chd2(disp, rows2, size, n_buckets):
    def f(a, b, valid):
        bucket = mix_hash_jnp(a, b, n_buckets - 1)
        d = disp[bucket]
        pos = (mix_hash2_jnp(a, b, size - 1) + d) & (size - 1)
        row = rows2[pos]  # [..., 2] u32
        k = (a.astype(jnp.uint32) << 16) | b.astype(jnp.uint32)
        hit = (row[..., 0] == k) & valid
        rm = row[..., 1]
        rank = jnp.where(hit, (rm >> 16).astype(jnp.int32), INF_RANK)
        minted = (rm & 0xFFFF).astype(jnp.int32)
        return rank, minted

    return f


def lookup_cuckoo2(t1, t2, m):
    def f(a, b, valid):
        k = (a.astype(jnp.uint32) << 16) | b.astype(jnp.uint32)
        p1 = mix_hash_jnp(a, b, m - 1)
        p2 = mix_hash2_jnp(a, b, m - 1)
        r1 = t1[p1]  # independent
        r2 = t2[p2]  # independent
        hit1 = (r1[..., 0] == k) & valid
        hit2 = (r2[..., 0] == k) & valid
        rm = jnp.where(hit1, r1[..., 1], r2[..., 1])
        hit = hit1 | hit2
        rank = jnp.where(hit, (rm >> 16).astype(jnp.int32), INF_RANK)
        minted = (rm & 0xFFFF).astype(jnp.int32)
        return rank, minted

    return f


# --- quotient cuckoo: one u32 per slot (quotient<<16 | rank), minted
# derived affinely from rank (new_id = base + rank, checked at build).
# h is a BIJECTION on u32 keys, so (slot == h(k).low16) & (q == h(k).hi16)
# <=> exact key equality — no stored key needed.

_QC1_MUL = np.uint32(0x9E3779B1)  # odd -> invertible
_QC2_MUL = np.uint32(0x85EBCA77)


def _qhash_np(k32: np.ndarray, which: int) -> np.ndarray:
    x = k32.astype(np.uint64)
    M = np.uint64(0xFFFFFFFF)
    mul = np.uint64(int(_QC1_MUL if which == 0 else _QC2_MUL))
    x = (x * mul) & M
    x = x ^ (x >> np.uint64(16))
    mul2 = np.uint64(0x7FEB352D if which == 0 else 0x45D9F3B3)
    x = (x * mul2) & M
    x = x ^ (x >> np.uint64(15))
    return x.astype(np.uint32)


def _qhash_jnp(k32, which: int):
    x = k32.astype(jnp.uint32)
    x = x * (_QC1_MUL if which == 0 else _QC2_MUL)
    x = x ^ (x >> np.uint32(16))
    x = x * (np.uint32(0x7FEB352D) if which == 0 else np.uint32(0x45D9F3B3))
    x = x ^ (x >> np.uint32(15))
    return x


def build_qcuckoo(merge_ranks, merge_ops):
    """Quotient cuckoo build; returns (t1, t2, base) or None if the
    minted ids are not affine in rank or ranks exceed 16 bits."""
    n = len(merge_ranks)
    if n == 0 or n > 0xFFFE:
        return None
    base = None
    for r, (_ab, new_id) in merge_ops.items():
        if base is None:
            base = new_id - r
        elif new_id - r != base:
            return None
    m = 65536
    keys = list(merge_ranks.keys())
    k32 = np.array([(a << 16) | b for a, b in keys], np.uint32)
    h1 = _qhash_np(k32, 0)
    h2 = _qhash_np(k32, 1)
    s1 = (h1 & np.uint32(m - 1)).tolist()
    q1 = (h1 >> np.uint32(16)).tolist()
    s2 = (h2 & np.uint32(m - 1)).tolist()
    q2 = (h2 >> np.uint32(16)).tolist()
    ranks = [merge_ranks[k] for k in keys]
    info = {}
    for i in range(n):
        info[int(k32[i])] = (s1[i], q1[i], s2[i], q2[i], ranks[i])
    occ0 = [None] * m
    occ1 = [None] * m
    for k in info:
        cur, side = k, 0
        for _ in range(500):
            e = info[cur]
            pos = e[0] if side == 0 else e[2]
            occ = occ0 if side == 0 else occ1
            prev = occ[pos]
            occ[pos] = cur
            if prev is None:
                cur = None
                break
            cur, side = prev, 1 - side
        if cur is not None:
            return None
    t = np.full((2, m), 0xFFFFFFFF, dtype=np.uint32)
    for side, occ in ((0, occ0), (1, occ1)):
        for pos, k in enumerate(occ):
            if k is not None:
                e = info[k]
                q = e[1] if side == 0 else e[3]
                t[side, pos] = (q << 16) | e[4]
    return t[0], t[1], base


def lookup_qcuckoo(t1, t2, base: int):
    def f(a, b, valid):
        k = (a.astype(jnp.uint32) << 16) | b.astype(jnp.uint32)
        h1 = _qhash_jnp(k, 0)
        h2 = _qhash_jnp(k, 1)
        e1 = t1[(h1 & np.uint32(0xFFFF)).astype(jnp.int32)]
        e2 = t2[(h2 & np.uint32(0xFFFF)).astype(jnp.int32)]
        r1 = e1 & np.uint32(0xFFFF)
        r2 = e2 & np.uint32(0xFFFF)
        hit1 = ((e1 >> 16) == (h1 >> 16)) & (r1 != 0xFFFF) & valid
        hit2 = ((e2 >> 16) == (h2 >> 16)) & (r2 != 0xFFFF) & valid
        r = jnp.where(hit1, r1, jnp.where(hit2, r2, np.uint32(INF_RANK)))
        rank = r.astype(jnp.int32)
        minted = rank + base
        return jnp.where(hit1 | hit2, rank, INF_RANK), minted

    return f


def lookup_fake():
    def f(a, b, valid):
        r = ((a * 7 + b * 13) & 1023).astype(jnp.int32)
        return jnp.where(valid, r, INF_RANK), (a + b) & 0x7FFF

    return f


def time_chain(body, t0_dev, K):
    fn = jax.jit(
        lambda t: jax.lax.fori_loop(0, K, body, t), static_argnums=()
    )
    out = fn(t0_dev)
    np.asarray(out)  # warm + sync
    best = float("inf")
    for _ in range(5):
        s = time.perf_counter()
        out = fn(t0_dev)
        np.asarray(jnp.sum(out))
        best = min(best, time.perf_counter() - s)
    return best


def main():
    tok = load_tables()
    p = tok._get_pipeline()
    assert p is not None
    mr = tok.bpe.merge_ranks
    mo = tok.bpe.merge_ops
    print(f"merges={len(mr)} chd_size={p.table_size} buckets={p.n_buckets}",
          file=sys.stderr)

    print("pulling tables to host...", file=sys.stderr)
    rows_np = np.asarray(p.rows)
    print("packing...", file=sys.stderr)
    rows2_np = pack_chd2(rows_np)
    t1_np, t2_np, m = build_cuckoo(mr, mo)
    print(f"cuckoo m={m} (2x{m*8/1024:.0f} KB)", file=sys.stderr)

    disp = jnp.asarray(np.asarray(p.disp))
    rows = jnp.asarray(rows_np)
    rows2 = jnp.asarray(rows2_np)
    ct1 = jnp.asarray(t1_np)
    ct2 = jnp.asarray(t2_np)

    # realistic token state: seed tokens of a packed novel-word fill
    rng = np.random.RandomState(0)
    # byte-token seeds: ascii letters region of the byte_token_table
    btt = np.asarray(p.byte_token_table)
    letters = np.frombuffer(b"etaoinshrdlcumwfgypbvkjxqz", np.uint8)
    toks = btt[letters[rng.randint(0, 26, size=(B, W))].astype(np.int32)]
    # sprinkle tombstones like a packed layout (~5% pad)
    toks[:, -6:] = -1
    t0_dev = jax.device_put(jnp.asarray(toks.astype(np.int32)))

    variants = {
        "chd4": make_body(lookup_chd4(disp, rows, p.table_size, p.n_buckets)),
        "chd2": make_body(lookup_chd2(disp, rows2, p.table_size, p.n_buckets)),
        "cuckoo2": make_body(lookup_cuckoo2(ct1, ct2, m)),
        "scans": make_body(lookup_fake()),
        "chd4_g": make_body(
            lookup_chd4(disp, rows, p.table_size, p.n_buckets), with_scans=False
        ),
        "chd2_g": make_body(
            lookup_chd2(disp, rows2, p.table_size, p.n_buckets), with_scans=False
        ),
        "cuckoo2_g": make_body(lookup_cuckoo2(ct1, ct2, m), with_scans=False),
    }
    qc = build_qcuckoo(mr, mo)
    if qc is not None:
        qt1, qt2, qbase = qc
        print(f"qcuckoo built, base={qbase}", file=sys.stderr)
        jqt1 = jnp.asarray(qt1)
        jqt2 = jnp.asarray(qt2)
        variants["qcuckoo"] = make_body(lookup_qcuckoo(jqt1, jqt2, qbase))
        variants["qcuckoo_g"] = make_body(
            lookup_qcuckoo(jqt1, jqt2, qbase), with_scans=False
        )
    else:
        print("qcuckoo inapplicable", file=sys.stderr)

    # int32 twin of cuckoo2 (u32 arithmetic may lower differently)
    ct1_i = jnp.asarray(t1_np.astype(np.int64).astype(np.int32))
    ct2_i = jnp.asarray(t2_np.astype(np.int64).astype(np.int32))

    def lookup_cuckoo2_i32(t1, t2, m):
        def f(a, b, valid):
            k = ((a << 16) | b).astype(jnp.int32)
            p1 = mix_hash_jnp(a, b, m - 1)
            p2 = mix_hash2_jnp(a, b, m - 1)
            r1 = t1[p1]
            r2 = t2[p2]
            hit1 = (r1[..., 0] == k) & valid
            hit2 = (r2[..., 0] == k) & valid
            rm = jnp.where(hit1, r1[..., 1], r2[..., 1])
            hit = hit1 | hit2
            rank = jnp.where(
                hit, (rm >> 16) & 0xFFFF, INF_RANK
            )
            minted = rm & 0xFFFF
            return rank, minted

        return f

    variants["cuckoo2_i32"] = make_body(lookup_cuckoo2_i32(ct1_i, ct2_i, m))
    # one [2m,2] array, both probes (second offset by m): one operand,
    # two gathers — tests whether operand count matters
    cboth = jnp.asarray(np.concatenate([t1_np, t2_np], axis=0))

    def lookup_cuckoo2_one(t, m):
        def f(a, b, valid):
            k = (a.astype(jnp.uint32) << 16) | b.astype(jnp.uint32)
            p1 = mix_hash_jnp(a, b, m - 1)
            p2 = mix_hash2_jnp(a, b, m - 1) + m
            r1 = t[p1]
            r2 = t[p2]
            hit1 = (r1[..., 0] == k) & valid
            hit2 = (r2[..., 0] == k) & valid
            rm = jnp.where(hit1, r1[..., 1], r2[..., 1])
            hit = hit1 | hit2
            rank = jnp.where(
                hit, (rm >> np.uint32(16)).astype(jnp.int32), INF_RANK
            )
            minted = (rm & np.uint32(0xFFFF)).astype(jnp.int32)
            return rank, minted

        return f

    variants["cuckoo2_one"] = make_body(lookup_cuckoo2_one(cboth, m))

    sel = set(sys.argv[1:])
    for name, body in variants.items():
        if sel and name not in sel:
            continue
        try:
            t4 = time_chain(body, t0_dev, 4)
            t24 = time_chain(body, t0_dev, 24)
            per = (t24 - t4) / 20
            print(f"{name:10s}  K4={t4*1e3:7.2f} ms  K24={t24*1e3:7.2f} ms  "
                  f"per-iter={per*1e3:6.3f} ms")
        except Exception as e:
            print(f"{name:10s}  FAILED: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
