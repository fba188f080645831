"""Pallas TPU kernels + the applicability analysis for this workload.

Where Pallas fits a byte-level BPE tokenizer
--------------------------------------------

The hot device computation is the merge fixpoint loop (ops/merge.py):
per iteration it does two data-dependent gathers into large tables (the
CHD perfect-hash pair table, ~#merges rows) plus a handful of carry scans.
Mosaic (the Pallas TPU compiler, jax 0.9) lowers dynamic gathers **only as
a same-shape ``take_along_axis`` within one 128-lane tile** — i.e. a
lookup table of at most 128 entries per row.  Probed empirically on this
backend:

- ``table[idx]`` with a 4K-entry VMEM table  -> "Cannot do int indexing on TPU"
- ``take_along_axis`` on ``[8, 512]``        -> Mosaic layout assertion
- ``take_along_axis`` on ``[8, 128]``        -> works (hardware lane gather)

A 50K-100K-entry pair table therefore cannot be probed inside a kernel
(one-hot MXU contractions would cost O(table) FLOPs per lookup), so the
merge loop's lookups stay in XLA, which has native big-table gather
support; XLA already fuses the surrounding elementwise work into them.

What *does* fit is any table of <=128 entries (after splitting on a high
bit, <=256): the byte->initial-token seed table (C4's bytes_to_unicode
composed with the vocab) is exactly 256 entries.  The kernel below fuses
the byte->token gather, the length masking and the tombstone fill of the
word path's seed stage into one VMEM pass — one HBM read of the byte
matrix, one write of the token matrix, no intermediate arrays.

Numerically pinned against the pure-JAX implementation by
tests/test_device_encode.py::test_pallas_seed_matches_xla (interpret mode
on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["pallas_seed_tokens", "pallas_available"]


def pallas_available() -> bool:
    """Whether the production word path should use the Pallas seed kernel.

    Opt-in (CTOK_PALLAS=1) on TPU backends — decided by measurement, not
    by default (PROFILE.md "Pallas vs XLA"): on-chip A/B at [64,128],
    [256,128] and [1024,128] shows the Pallas kernel and the XLA
    gather+mask fusion equal within noise at every production shape
    (e.g. 30.1 ms vs 31.2 ms at [1024,128], outputs bit-identical), so
    the default path keeps the XLA form, which additionally fuses into
    the downstream merge computation.  Round 1's >9-minute Mosaic compile
    stall at [1024,128] no longer reproduces (compiles now take 0.5-1.5s).
    The kernel stays pinned correct by
    tests/test_device_encode.py::test_pallas_seed_matches_xla."""
    import os

    try:
        return (
            os.environ.get("CTOK_PALLAS", "") == "1"
            and jax.default_backend() == "tpu"
        )
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_seed_tokens(arr, lens, byte_token_table, interpret: bool = False):
    """Fused seed stage on the word matrix: ``tokens[r, i] =
    byte_token_table[arr[r, i]]`` where ``i < lens[r]`` else -1.

    Args:
      arr: [B, W] uint8 word bytes (W a multiple of 128).
      lens: [B] int32 word lengths.
      byte_token_table: [256] int32 (-1 for out-of-vocab bytes).
    Returns:
      [B, W] int32 token ids with -1 tombstones.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, W = arr.shape
    # split the 256-entry table on the high bit: two 128-lane rows, each
    # gatherable with the hardware lane gather
    lo = byte_token_table[:128].astype(jnp.int32)
    hi = byte_token_table[128:].astype(jnp.int32)

    def kernel(arr_ref, lens_ref, lo_ref, hi_ref, out_ref):
        b = arr_ref[:].astype(jnp.int32)
        idx = b & 0x7F
        rows = b.shape[0]
        # broadcast each 128-entry half across the row tile and gather
        # within lanes (the only dynamic-gather form Mosaic supports)
        lo_t = jnp.broadcast_to(lo_ref[:].reshape(1, 128), (rows, 128))
        hi_t = jnp.broadcast_to(hi_ref[:].reshape(1, 128), (rows, 128))
        w = b.shape[1]
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
        valid = cols < lens_ref[:].reshape(rows, 1)
        for j in range(w // 128):
            sl = slice(j * 128, (j + 1) * 128)
            ij = idx[:, sl]
            tl = jnp.take_along_axis(lo_t, ij, axis=1)
            th = jnp.take_along_axis(hi_t, ij, axis=1)
            res = jnp.where(b[:, sl] < 128, tl, th)
            out_ref[:, sl] = jnp.where(valid[:, sl], res, -1)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(arr, lens, lo, hi)
