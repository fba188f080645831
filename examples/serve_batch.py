"""Batch-serving walkthrough: the three output forms of the encode tier.

Loads a tokenizer.json, encodes a stream of batches and feeds a (toy) jax
model — showing the zero-copy ragged form, the transformers-style columnar
``__call__``, and direct device tensors via ``return_tensors="jax"``.

Usage:
    python serve_batch.py path/to/tokenizer.json
"""

import sys
import time

from complexity_tokenizer_tpu import Tokenizer


def main(path: str) -> None:
    tok = Tokenizer.from_file(path)

    batch = [
        "The quick brown fox jumps over the lazy dog.",
        "It's a test, isn't it? Numbers: 123 456.",
        "Short.",
    ] * 256

    # 1. zero-copy ragged: (flat int32 ids, int64 row offsets) — the
    # framework-native form; row i is flat[offs[i]:offs[i+1]].
    # On a TPU host this default path also launches asynchronous device
    # fills: the chip batch-merges every distinct new word in the
    # background while the native runtime assembles from its caches, so
    # steady-state serving runs "chip merges novel words, host assembles".
    flat, offs = tok.encode_batch_ragged(batch)
    print(f"ragged: {len(flat)} ids over {len(offs) - 1} rows")
    wp = tok._auto_word_path()
    if wp is not None:
        wp.drain_async(timeout=600)  # let the demo's fill land
        print("auto device fill active (word caches chip-computed)")

    # 2. transformers-style call (columnar fast path): lists / BatchEncoding
    enc = tok(batch, padding="longest", truncation=True, max_length=128)
    print(f"call: {len(enc)} rows, width {len(enc.input_ids[0])}")

    # 3. device tensors: jax arrays ready for a jitted model
    enc = tok(
        batch,
        padding="max_length",
        truncation=True,
        max_length=128,
        return_tensors="jax",
    )
    import jax
    import jax.numpy as jnp

    @jax.jit
    def toy_model(ids, mask):
        # stand-in for an embedding + reduction
        return jnp.sum(ids * mask, axis=-1)

    t0 = time.perf_counter()
    out = toy_model(enc.input_ids, enc.attention_mask)
    out.block_until_ready()
    print(
        f"model step on {out.shape[0]} rows in "
        f"{(time.perf_counter() - t0) * 1e3:.1f} ms (backend: "
        f"{jax.default_backend()})"
    )

    # round-trip check through the ragged decoder (vs the per-row decode;
    # chars absent from the training corpus drop silently, bpe.rs:94-97)
    texts = tok.decode_batch_ragged(flat, offs)
    ref = tok.decode([int(x) for x in flat[offs[0] : offs[1]]])
    assert texts[0] == ref
    print("ragged decode round-trip OK:", repr(texts[0][:50]))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".cache/bench_tokenizer.json")
