"""Wheel smoke test: import from the installed wheel (not the repo),
train a tiny tokenizer, round-trip encode/decode, and confirm the native
C++ tier compiled from the packaged source."""

import os
import tempfile

# run from a neutral cwd so the installed wheel, not the checkout, imports
os.chdir(tempfile.mkdtemp())

import complexity_tokenizer_tpu as ctt  # noqa: E402

trainer = ctt.Trainer(vocab_size=300)
trainer.train_from_iterator(["hello world", "the quick brown fox"] * 50)
path = os.path.join(tempfile.mkdtemp(), "tok.json")
trainer.save(path)
tok = ctt.Tokenizer.from_file(path)
ids = tok.encode("hello world")
assert ids, "empty encode"
assert tok.decode(ids) == "hello world", tok.decode(ids)
batch = tok(["hello world", "fox"], padding="longest")
assert len(batch.input_ids) == 2

from complexity_tokenizer_tpu import native  # noqa: E402

print("native tier available:", native.available())
print("wheel smoke OK:", ids)
