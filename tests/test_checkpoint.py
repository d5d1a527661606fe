"""Mid-training checkpoint / resume: deterministic replay conformance."""

import numpy as np
import pytest

from gpu_bpe_tpu.ops import TPUTrainer, make_stream
from gpu_bpe_tpu.ops.checkpoint import (
    TrainingCheckpoint,
    fingerprint_stream,
    replay_merges,
    resume_stream,
)
from gpu_bpe_tpu.pretok import PreTokenizer


@pytest.fixture(scope="module")
def stream(english_text):
    data, starts = PreTokenizer().pre_tokenize(english_text[:6000])
    return make_stream(data, starts, dedup=True)


def test_replay_reproduces_symbol_stream(stream):
    """Replaying the merge list reproduces the exact device stream the
    original training run ended with (verified via the numpy oracle)."""
    from gpu_bpe_tpu.core import apply_merge

    full = TPUTrainer().train_stream(stream, target_vocab_size=300)
    replayed = replay_merges(stream, full.merges)

    expected = stream.symbols[: stream.n].copy()
    for a, b, new_id in full.merges:
        expected = apply_merge(expected, a, b, new_id)
    n = int(replayed.n)
    assert n == len(expected)
    assert np.asarray(replayed.symbols)[:n].tolist() == expected.tolist()


def test_resume_continues_identically(stream, tmp_path):
    # one-shot training to 340
    oneshot = TPUTrainer().train_stream(stream, target_vocab_size=340)

    # train to 300 with checkpointing, then resume to 340
    ckpt = str(tmp_path / "ckpt.json")
    TPUTrainer(batch_merges=16).train_stream(stream, target_vocab_size=300,
                                             checkpoint_path=ckpt, checkpoint_every=1)
    resumed = TPUTrainer(batch_merges=16).train_stream(stream, target_vocab_size=340,
                                                       checkpoint_path=ckpt)
    assert resumed.merges == oneshot.merges
    assert resumed.merge_counts == oneshot.merge_counts


def test_checkpoint_json_roundtrip(stream, tmp_path):
    r = TPUTrainer().train_stream(stream, target_vocab_size=280)
    ck = TrainingCheckpoint(
        merges=r.merges, merge_counts=r.merge_counts, next_token_id=280,
        corpus_fingerprint=fingerprint_stream(stream), target_vocab_size=280,
    )
    p = str(tmp_path / "c.json")
    ck.save(p)
    loaded = TrainingCheckpoint.load(p)
    assert loaded.merges == ck.merges
    assert loaded.corpus_fingerprint == ck.corpus_fingerprint
    # checkpoint doubles as a loadable partial model
    from gpu_bpe_tpu.core import BPEModel

    model = BPEModel.load(p)
    assert model.vocab_size == 280


def test_fingerprint_mismatch_rejected(stream):
    ck = TrainingCheckpoint(merges=[(97, 98, 256)], merge_counts=[2],
                            next_token_id=257, corpus_fingerprint="deadbeef",
                            target_vocab_size=300)
    with pytest.raises(ValueError):
        resume_stream(stream, ck, strict=True)
