"""Train a 32K tokenizer on FineWeb-Edu using INL-BPE dynamics.

TPU-native twin of the reference example
(`/root/reference/examples/train_eduweb.py`): same configuration surface;
set ``DISTRIBUTED=True`` to run the corpus sharded over a
``jax.sharding.Mesh`` with psum-reduced pair histograms.

Usage:
    pip install datasets
    python train_eduweb.py
"""

import itertools

VOCAB_SIZE = 32000
NUM_SAMPLES = 100_000
OUTPUT_PATH = "tokenizer_32k.json"
DISTRIBUTED = False

INL_ALPHA = 0.9  # momentum
INL_BETA = 0.3  # correction strength
INL_GATE = 0.5  # amplitude control


def main():
    from datasets import load_dataset

    print(f"Training {VOCAB_SIZE} vocab tokenizer on FineWeb-Edu...")
    ds = load_dataset(
        "HuggingFaceFW/fineweb-edu",
        name="sample-10BT",
        split="train",
        streaming=True,
    )

    if DISTRIBUTED:
        from complexity_tokenizer_tpu.parallel import DistributedInlTrainer as Trainer
    else:
        from complexity_tokenizer_tpu import Trainer

    trainer = Trainer(
        vocab_size=VOCAB_SIZE,
        min_frequency=2,
        min_word_length=1,
        inl_alpha=INL_ALPHA,
        inl_beta=INL_BETA,
        inl_gate=INL_GATE,
    )

    print(f"Extracting {NUM_SAMPLES} text samples...")
    texts = [row["text"] for row in itertools.islice(ds, NUM_SAMPLES)]
    print(f"  Got {len(texts)} texts")

    print("Training tokenizer with INL-BPE dynamics...")
    trainer.train_from_iterator(texts)

    print(f"Saving to {OUTPUT_PATH}...")
    trainer.save(OUTPUT_PATH)
    print(f"Done! Vocab size: {trainer.vocab_size}, Merges: {trainer.num_merges}")


if __name__ == "__main__":
    main()
