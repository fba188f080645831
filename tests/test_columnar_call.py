"""Columnar ``__call__`` fast path (ColumnarBatchEncoding) vs the per-row
Encoding path: every batch-level field and every lazily-materialized row
must be bit-identical across padding/truncation/stride/side configs and
across static-frameable post-processors."""

import itertools

import pytest

from complexity_tokenizer_tpu.batch_encoding import ColumnarBatchEncoding
from complexity_tokenizer_tpu.core.postprocessors import (
    BertProcessing,
    RobertaProcessing,
    TemplateProcessing,
)

from helpers import conformance_corpus, trained_tokenizer

FIELDS = (
    "input_ids",
    "attention_mask",
    "token_type_ids",
    "special_tokens_mask",
)


def _per_row(tok, *args, **kwargs):
    orig = tok._call_batch_columnar
    tok._call_batch_columnar = lambda *a, **k: None
    try:
        return tok(*args, **kwargs)
    finally:
        tok._call_batch_columnar = orig


def _texts():
    return conformance_corpus() + ["", " ", "a"]


@pytest.mark.parametrize(
    "padding,truncation,max_length,stride,side",
    [
        (p, t, m, s, side)
        for p, t, m, s, side in itertools.product(
            [None, "longest", "max_length", "left"],
            [False, True],
            [12, 48, None],
            [0, 3],
            ["right", "left"],
        )
        if not (s and not t)
    ],
)
def test_columnar_call_matches_per_row(
    padding, truncation, max_length, stride, side
):
    tok = trained_tokenizer()
    tok.set_padding_side(side)
    kwargs = dict(
        padding=padding,
        truncation=truncation,
        max_length=max_length,
        stride=stride,
        return_special_tokens_mask=True,
    )
    texts = _texts()
    got = tok(texts, **kwargs)
    ref = _per_row(tok, texts, **kwargs)
    assert isinstance(got, ColumnarBatchEncoding)
    for f in FIELDS:
        assert getattr(got, f) == getattr(ref, f), f
    # lazy per-row materialization replays the per-row path exactly
    for i in (0, 5, len(texts) - 1):
        ea, eb = got[i], ref[i]
        assert ea.ids == eb.ids
        assert ea.tokens == eb.tokens
        assert ea.type_ids == eb.type_ids
        assert ea.attention_mask == eb.attention_mask
        assert ea.special_tokens_mask == eb.special_tokens_mask
        assert ea.sequence_ids == eb.sequence_ids
        assert ea.n_overflowing() == eb.n_overflowing()
        for w_a, w_b in zip(ea.overflowing, eb.overflowing):
            assert w_a.ids == w_b.ids
        assert ea.offsets == eb.offsets  # forces the lazy aux thunk
        assert ea.word_ids == eb.word_ids


@pytest.mark.parametrize(
    "pp,expect_columnar",
    [
        (None, True),
        (
            TemplateProcessing(
                single="<s> $A </s>",
                special_tokens=[("<s>", 5), ("</s>", 6)],
            ),
            True,
        ),
        (
            TemplateProcessing(
                single="$A </s>", special_tokens=[("</s>", 6)]
            ),
            True,
        ),
        (
            TemplateProcessing(
                single="<s> <s> $A", special_tokens=[("<s>", 5)]
            ),
            True,
        ),
        (BertProcessing(cls=("[CLS]", 3), sep=("[SEP]", 4)), True),
        (RobertaProcessing(bos=("<s>", 5), eos=("</s>", 6)), True),
        # $A twice: not a static frame -> must fall back, stay correct
        (
            TemplateProcessing(
                single="$A </s> $A", special_tokens=[("</s>", 6)]
            ),
            False,
        ),
    ],
)
def test_columnar_call_frames(pp, expect_columnar):
    tok = trained_tokenizer()
    tok.set_post_processor(pp)
    kwargs = dict(
        padding="longest",
        truncation=True,
        max_length=24,
        return_special_tokens_mask=True,
    )
    texts = _texts()
    got = tok(texts, **kwargs)
    ref = _per_row(tok, texts, **kwargs)
    assert isinstance(got, ColumnarBatchEncoding) == expect_columnar
    for f in FIELDS:
        assert getattr(got, f) == getattr(ref, f), f
    ea, eb = got[2], ref[2]
    assert ea.ids == eb.ids
    assert ea.special_tokens_mask == eb.special_tokens_mask


def test_columnar_numpy_exports_and_dict():
    tok = trained_tokenizer()
    texts = _texts()
    got = tok(texts, padding="longest", truncation=True, max_length=24)
    ref = _per_row(
        tok, texts, padding="longest", truncation=True, max_length=24
    )
    for a, b in zip(got.input_ids_as_numpy(), ref.input_ids_as_numpy()):
        assert a.tolist() == b.tolist()
    for a, b in zip(
        got.attention_mask_as_numpy(), ref.attention_mask_as_numpy()
    ):
        assert a.tolist() == b.tolist()
    assert got.to_dict() == ref.to_dict()
    assert got.keys() == ref.keys()
    assert len(got) == len(ref)
    assert got["input_ids"] == ref["input_ids"]
    assert len(got.encodings()) == len(texts)


def test_columnar_offsets_requested_falls_back():
    tok = trained_tokenizer()
    texts = _texts()[:8]
    got = tok(texts, return_offsets_mapping=True)
    assert not isinstance(got, ColumnarBatchEncoding)
    ref = _per_row(tok, texts, return_offsets_mapping=True)
    assert got.offset_mapping == ref.offset_mapping


def test_return_tensors_np_and_jax():
    import numpy as np

    tok = trained_tokenizer()
    texts = _texts()
    got = tok(
        texts,
        padding="longest",
        truncation=True,
        max_length=24,
        return_tensors="np",
        return_special_tokens_mask=True,
    )
    ref = _per_row(
        tok,
        texts,
        padding="longest",
        truncation=True,
        max_length=24,
        return_special_tokens_mask=True,
    )
    assert isinstance(got.input_ids, np.ndarray)
    assert got.input_ids.tolist() == ref.input_ids
    assert got.attention_mask.tolist() == ref.attention_mask
    assert got.token_type_ids.tolist() == ref.token_type_ids
    assert got.special_tokens_mask.tolist() == ref.special_tokens_mask
    # per-row path with return_tensors must produce the same arrays
    ref_t = _per_row(
        tok, texts, padding="longest", truncation=True, max_length=24,
        return_tensors="np",
    )
    assert ref_t.input_ids.tolist() == got.input_ids.tolist()
    # jax output
    got_j = tok(
        texts, padding="max_length", truncation=True, max_length=16,
        return_tensors="jax",
    )
    import jax.numpy as jnp

    assert isinstance(got_j.input_ids, jnp.ndarray)
    assert got_j.input_ids.shape == (len(texts), 16)


def test_return_tensors_requires_padding():
    import pytest as _pytest

    tok = trained_tokenizer()
    texts = ["one two three", "a much longer sentence here"]
    with _pytest.raises(ValueError):
        tok(texts, return_tensors="np").input_ids
    with _pytest.raises(ValueError):
        _per_row(tok, texts, return_tensors="np").input_ids


def test_frame_matrix_matches_frame_rows():
    """The C frame_matrix fill (dense return_tensors path) must agree with
    frame_rows element-for-element, including left padding, truncation
    that cuts into the suffix frame, and ragged final lengths."""
    import numpy as np

    from complexity_tokenizer_tpu.native import load_ext

    ext = load_ext()
    if ext is None or not hasattr(ext, "frame_matrix"):
        import pytest as _pytest

        _pytest.skip("no C extension")
    rng = np.random.RandomState(7)
    for trial in range(60):
        n = int(rng.randint(1, 9))
        lens = rng.randint(0, 12, size=n)
        offs = np.zeros(n + 1, np.int64)
        offs[1:] = np.cumsum(lens)
        flat = rng.randint(0, 1000, size=int(offs[-1])).astype(np.int32)
        prefix = [int(x) for x in rng.randint(0, 50, size=rng.randint(0, 3))]
        suffix = [int(x) for x in rng.randint(0, 50, size=rng.randint(0, 3))]
        trunc = int(rng.choice([-1, 1, 2, 5, 9]))
        pad_to = int(rng.choice([-1, 0, 4, 10, 16]))
        pad_left = int(rng.randint(0, 2))
        pad_id = 7777
        rows = ext.frame_rows(flat, offs, prefix, suffix, trunc, pad_to,
                              pad_id, pad_left)
        L = max((len(r) for r in rows), default=0)
        mat = np.empty((n, L), np.int32)
        ext.frame_matrix(flat, offs, prefix, suffix, trunc, pad_to, pad_id,
                         pad_left, mat)
        for i, r in enumerate(rows):
            assert mat[i, : len(r)].tolist() == r, (trial, i)
            assert (mat[i, len(r):] == pad_id).all(), (trial, i)


def test_frame_entry_points_reject_bad_offsets():
    """Negative, non-monotonic, or out-of-range row offsets must raise,
    never read out of bounds (both frame_rows and frame_matrix)."""
    import numpy as np
    import pytest as _pytest

    from complexity_tokenizer_tpu.native import load_ext

    ext = load_ext()
    if ext is None or not hasattr(ext, "frame_matrix"):
        _pytest.skip("no C extension")
    flat = np.arange(6, dtype=np.int32)
    bad_offsets = [
        np.array([-100, 0], np.int64),       # negative start
        np.array([0, 4, 2, 6], np.int64),    # non-monotonic
        np.array([0, 99], np.int64),         # past the end of flat
        np.array([2, 1], np.int64),          # end < start
    ]
    for offs in bad_offsets:
        with _pytest.raises(ValueError):
            ext.frame_rows(flat, offs, [], [], -1, -1, 0, 0)
        out = np.empty((len(offs) - 1, 8), np.int32)
        with _pytest.raises(ValueError):
            ext.frame_matrix(flat, offs, [], [], -1, -1, 0, 0, out)


def test_mask_matrix_matches_numpy_reference():
    """The C mask_matrix (tensor-mode attention masks) must agree with the
    arange-comparison form for both padding sides, including t == 0 and
    t == final rows."""
    import numpy as np
    import pytest as _pytest

    from complexity_tokenizer_tpu.native import load_ext

    ext = load_ext()
    if ext is None or not hasattr(ext, "mask_matrix"):
        _pytest.skip("no C extension")
    rng = np.random.RandomState(11)
    for trial in range(40):
        n = int(rng.randint(1, 12))
        L = int(rng.randint(1, 20))
        t = rng.randint(0, L + 1, size=n).astype(np.int64)
        f = np.full(n, L, np.int64)
        for pad_left in (0, 1):
            out = np.empty((n, L), np.int32)
            ext.mask_matrix(t, f, pad_left, L, out)
            pos = np.arange(L, dtype=np.int64)[None, :]
            want = (
                pos >= (f[:, None] - t[:, None])
                if pad_left
                else pos < t[:, None]
            ).astype(np.int32)
            assert (out == want).all(), (trial, pad_left)


def test_mask_matrix_rejects_bad_lengths():
    import numpy as np
    import pytest as _pytest

    from complexity_tokenizer_tpu.native import load_ext

    ext = load_ext()
    if ext is None or not hasattr(ext, "mask_matrix"):
        _pytest.skip("no C extension")
    out = np.empty((2, 4), np.int32)
    # t > final
    with _pytest.raises(ValueError):
        ext.mask_matrix(np.array([5, 1], np.int64),
                        np.array([4, 4], np.int64), 0, 4, out)
    # final > L
    with _pytest.raises(ValueError):
        ext.mask_matrix(np.array([1, 1], np.int64),
                        np.array([9, 9], np.int64), 0, 4, out)
    # caller-stated L inconsistent with the out buffer (the ADVICE r3
    # case: a wrong-shaped buffer whose element count happens to divide
    # by n must be rejected, not silently reinterpreted)
    with _pytest.raises(ValueError):
        ext.mask_matrix(np.array([1, 1], np.int64),
                        np.array([2, 2], np.int64), 0, 2, out)


def test_frame_rows_non_interned_pad_id():
    """A pad id outside the intern cache range (e.g. negative) must come
    back as a live, correct object in every pad slot (regression: the pad
    fill once dropped its reference before the bulk fill consumed it)."""
    import numpy as np
    import pytest as _pytest

    from complexity_tokenizer_tpu.native import load_ext

    ext = load_ext()
    if ext is None or not hasattr(ext, "frame_rows"):
        _pytest.skip("no C extension")
    flat = np.arange(5, dtype=np.int32)
    offs = np.array([0, 2, 5], np.int64)
    for pad_id in (-9, 1 << 22):
        rows = ext.frame_rows(flat, offs, [], [], -1, 6, pad_id, 0)
        assert rows == [[0, 1, pad_id, pad_id, pad_id, pad_id],
                        [2, 3, 4, pad_id, pad_id, pad_id]]
