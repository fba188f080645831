"""Aux subsystems: hub path resolution (hub.rs:179-206 ports), chat
templates, BatchEncoding dict API, trainer checkpoint/resume, metrics."""

import json

from complexity_tokenizer_tpu.batch_encoding import BatchEncoding
from complexity_tokenizer_tpu.core.encoding import Encoding
from complexity_tokenizer_tpu.hf import chat, hub
from complexity_tokenizer_tpu.utils.metrics import Counters, Timer

from helpers import trained_tokenizer


def test_hub_config_default():
    cfg = hub.HubConfig()
    assert "huggingface.co" in cfg.endpoint
    assert cfg.timeout == 60


def test_hub_cache_path():
    cfg = hub.HubConfig()
    assert "gpt2" in str(hub.get_cache_path("gpt2", cfg))
    assert "a--b" in str(hub.get_cache_path("a/b", cfg))


def test_hub_resolve_local_path(tmp_path):
    f = tmp_path / "test_tokenizer.json"
    f.write_text("{}")
    assert hub.resolve_model_path(str(f)) == f
    # directory containing tokenizer.json resolves to that file
    d = tmp_path / "model"
    d.mkdir()
    (d / "tokenizer.json").write_text("{}")
    assert hub.resolve_model_path(str(d)) == d / "tokenizer.json"


def test_hub_is_cached(tmp_path):
    cfg = hub.HubConfig(cache_dir=tmp_path)
    assert not hub.is_cached("org/model", "tokenizer.json", cfg)
    repo = tmp_path / "org--model"
    repo.mkdir()
    (repo / "tokenizer.json").write_text("{}")
    assert hub.is_cached("org/model", "tokenizer.json", cfg)
    hub.clear_cache("org/model", cfg)
    assert not hub.is_cached("org/model", "tokenizer.json", cfg)


def test_chat_formats():
    msgs = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "yo"},
    ]
    chatml = chat.apply_chat_template("x<|im_start|>y", msgs, True, "<s>", "</s>")
    assert "<|im_start|>user\nhi<|im_end|>" in chatml
    assert chatml.endswith("<|im_start|>assistant\n")
    llama = chat.apply_chat_template("[INST]", msgs, False, "<s>", "</s>")
    assert "[INST] hi [/INST]" in llama and "<<SYS>>" in llama
    alpaca = chat.apply_chat_template("### ", msgs, False, "<s>", "</s>")
    assert "### Human:\nhi" in alpaca
    plain = chat.apply_chat_template("other", msgs, True, "<s>", "</s>")
    assert "user: hi" in plain and plain.endswith("assistant: ")


def test_batch_encoding_dict_api():
    encs = [
        Encoding.from_ids([1, 2], ["a", "b"]),
        Encoding.from_ids([3], ["c"]),
    ]
    be = BatchEncoding(encs, True, True, False, True)
    assert be.keys() == [
        "input_ids",
        "attention_mask",
        "token_type_ids",
        "special_tokens_mask",
    ]
    d = be.to_dict()
    assert d["input_ids"] == [[1, 2], [3]]
    assert be["input_ids"] == [[1, 2], [3]]
    assert len(be) == 2
    assert be[0].ids == [1, 2]
    arrs = be.input_ids_as_numpy()
    assert arrs[0].dtype.name == "uint32"


def test_trainer_checkpoint_roundtrip(tmp_path):
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    t = InlBpeTrainer(TrainerConfig(vocab_size=300, min_frequency=1))
    t.count_batch(["hello world hello", "world of words"])
    ckpt = tmp_path / "ckpt.json"
    t.save_checkpoint(ckpt)
    t2 = InlBpeTrainer.load_checkpoint(ckpt)
    assert t2._word_freqs_accumulator == t._word_freqs_accumulator
    t.finish_training()
    t2.finish_training()
    assert t.vocab == t2.vocab
    assert t.merges == t2.merges
    # post-training state also checkpoints
    t.save_checkpoint(ckpt)
    t3 = InlBpeTrainer.load_checkpoint(ckpt)
    assert t3.vocab == t.vocab and t3.merges == t.merges


def test_metrics_counters():
    c = Counters()
    with Timer("encode", count=100, registry=c):
        pass
    snap = c.snapshot()
    assert snap["encode"] == 100
    assert "encode_seconds" in snap and "encode_per_s" in snap


def test_tokenizer_from_pretrained_local_cache(tmp_path, monkeypatch):
    from complexity_tokenizer_tpu.tokenizer import Tokenizer

    tok = trained_tokenizer()
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    repo = tmp_path / "huggingface" / "hub" / "me--model"
    repo.mkdir(parents=True)
    tok.save(repo / "tokenizer.json")
    loaded = Tokenizer.from_pretrained("me/model", local_files_only=True)
    assert loaded.vocab_size == tok.vocab_size


def test_counters_wired_into_batch_paths():
    """encode/decode ragged and the trainer feed the metrics registry
    (SURVEY §5.5: bytes/s, merges/s, texts/s are the north-star metrics)."""
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )
    from complexity_tokenizer_tpu.utils.metrics import counters

    from helpers import trained_tokenizer

    counters.reset()
    tr = InlBpeTrainer(TrainerConfig(vocab_size=300, min_frequency=1))
    tr.train_from_texts(["hello world", "the quick brown fox"] * 5)
    snap = counters.snapshot()
    assert snap.get("merges", 0) > 0
    assert snap.get("merges_seconds", 0) > 0
    tok = trained_tokenizer()
    texts = ["hello world", "the fox"] * 4
    flat, offs = tok.encode_batch_ragged(texts)
    tok.decode_batch_ragged(flat, offs)
    snap = counters.snapshot()
    assert snap.get("encode_texts", 0) == len(texts)
    assert snap.get("decode_texts", 0) == len(texts)
    assert snap.get("encode_texts_per_s", 0) > 0
    counters.reset()


def _ckpt_resume_case(trainer_cls, cfg_kwargs, tmp_path, texts, abort_at):
    from complexity_tokenizer_tpu.trainers.inl_trainer import TrainerConfig

    full = trainer_cls(TrainerConfig(**cfg_kwargs))
    full.train_from_texts(list(texts))

    ckpt = str(tmp_path / "trainer_ckpt.json")
    # preempted run: periodic checkpoints, abort partway through
    cfg = TrainerConfig(**cfg_kwargs, checkpoint_path=ckpt, checkpoint_interval=5)
    pre = trainer_cls(cfg)

    class _Abort(Exception):
        pass

    n_saves = {"n": 0}
    orig_save = pre.save_checkpoint

    def save_and_maybe_abort(path):
        orig_save(path)
        n_saves["n"] += 1
        if n_saves["n"] == abort_at:
            raise _Abort()

    pre.save_checkpoint = save_and_maybe_abort
    try:
        pre.train_from_texts(list(texts))
    except _Abort:
        pass
    else:
        raise AssertionError("training finished before the simulated preemption")

    resumed = trainer_cls.resume_training(ckpt)
    assert resumed.merges == full.merges
    assert resumed.vocab == full.vocab
    assert resumed.token_freqs == full.token_freqs


_SMALL = ["hello world hello", "the quick brown fox", "worldly words matter"] * 20


def test_checkpoint_resume_host_classic(tmp_path):
    from complexity_tokenizer_tpu.trainers.inl_trainer import InlBpeTrainer

    _ckpt_resume_case(
        InlBpeTrainer,
        dict(vocab_size=350, min_frequency=1, inl_alpha=0.0, inl_beta=0.0, inl_gate=0.0),
        tmp_path,
        _SMALL,
        abort_at=3,
    )


def test_checkpoint_resume_host_inl(tmp_path):
    """INL-mode checkpoints snap to the 100-merge rebuild boundaries (the
    only exactly-resumable points); needs a corpus with > 100 merges."""
    from helpers import SAMPLE_TEXT, conformance_corpus

    from complexity_tokenizer_tpu.trainers.inl_trainer import InlBpeTrainer

    texts = [SAMPLE_TEXT] * 3 + conformance_corpus()
    _ckpt_resume_case(
        InlBpeTrainer,
        dict(vocab_size=800, min_frequency=1),
        tmp_path,
        texts,
        abort_at=2,  # dies right after the merge-200 boundary checkpoint
    )


def test_checkpoint_resume_distributed(tmp_path):
    from complexity_tokenizer_tpu.parallel.trainer import DistributedInlTrainer

    _ckpt_resume_case(
        DistributedInlTrainer,
        dict(vocab_size=320, min_frequency=1, inl_alpha=0.0, inl_beta=0.0, inl_gate=0.0),
        tmp_path,
        _SMALL,
        abort_at=3,
    )


def test_trainer_progress_callback():
    """SURVEY §5.1: both trainers invoke progress_callback(stage, done,
    total) at stage boundaries and merge-loop cadence, and the callback is
    excluded from checkpoint serialization."""
    from complexity_tokenizer_tpu.trainers.bpe_trainer import (
        BpeTrainer,
        BpeTrainerConfig,
    )
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    texts = ["hello world the quick brown fox"] * 30

    events = []
    tr = InlBpeTrainer(
        TrainerConfig(
            vocab_size=300,
            special_tokens=[],
            progress_callback=lambda s, d, t: events.append((s, d, t)),
        )
    )
    tr.train_from_texts(texts)
    stages = [s for s, _, _ in events]
    assert "count" in stages and "pairs" in stages and "merge" in stages
    s, d, t = events[stages.index("merge")]
    assert d == len(tr.merges)

    events2 = []
    bt = BpeTrainer(
        BpeTrainerConfig(
            vocab_size=60,
            show_progress=False,
            progress_callback=lambda s, d, t: events2.append((s, d, t)),
        )
    )
    vocab, merges = bt.train(texts)
    assert ("merge", len(merges)) == events2[-1][:2]
    assert events2[0][0] == "count"


def test_trainer_progress_callback_not_checkpointed(tmp_path):
    from complexity_tokenizer_tpu.trainers.inl_trainer import (
        InlBpeTrainer,
        TrainerConfig,
    )

    path = str(tmp_path / "ck.json")
    tr = InlBpeTrainer(
        TrainerConfig(
            vocab_size=280,
            special_tokens=[],
            checkpoint_path=path,
            checkpoint_interval=10,
            inl_gate=0.0,
            progress_callback=lambda s, d, t: None,
        )
    )
    tr.train_from_texts(["some words repeat some words here"] * 20)
    tr.save_checkpoint(path)
    resumed = InlBpeTrainer.load_checkpoint(path)
    assert resumed.config.progress_callback is None
    assert resumed.vocab == tr.vocab


def test_bench_fill_npz_roundtrip(tmp_path, monkeypatch):
    """The bench's worker->main chip-fill handoff (bench._insert_fill_npz):
    a worker-format npz dump bulk-loads into a fresh tokenizer's caches
    (covered rows only) and the served ids equal the dump's."""
    import numpy as np

    import bench
    from helpers import trained_tokenizer

    tok = trained_tokenizer()
    native = tok._get_native_encoder()
    if native is None:
        pytest.skip("native runtime unavailable")
    words = [b" hello", b" world", b" the", b"zzqqy"]
    ids_rows = [native.encode(w) for w in words]
    # mark one word uncovered (counts = -1): it must NOT be inserted
    counts = np.array(
        [len(ids_rows[0]), len(ids_rows[1]), -1, len(ids_rows[3])],
        np.int64,
    )
    ids_flat = np.array(
        ids_rows[0] + ids_rows[1] + ids_rows[3], np.int32
    )
    lens = np.array([len(w) for w in words], np.int64)
    dump = tmp_path / "fill.npz"
    np.savez(
        dump,
        words_buf=np.frombuffer(b"".join(words), np.uint8),
        lens=lens,
        ids_flat=ids_flat,
        counts=counts,
        m_words_buf=np.zeros(0, np.uint8),
        m_lens=np.zeros(0, np.int64),
        m_ids_flat=np.zeros(0, np.int32),
        m_counts=np.zeros(0, np.int64),
    )
    monkeypatch.setattr(bench, "_DEV_FILL", dump)
    tok2 = trained_tokenizer()
    detail = {}
    n = bench._insert_fill_npz(tok2, detail)
    assert n == 3  # the uncovered row was skipped
    assert detail["device_fill_loaded_words"] == 3
    # covered words serve from the loaded caches, exactly
    got = tok2.encode_batch(["hello world", "zzqqy"])
    want = [tok2._encode_host("hello world"), tok2._encode_host("zzqqy")]
    assert got == want
