"""Distributed training on a virtual 8-device CPU mesh: exact conformance."""

import numpy as np
import pytest

from gpu_bpe_tpu.core import ReferenceTrainer, bytes_to_symbols, tag_word_boundaries
from gpu_bpe_tpu.parallel import DistributedTrainer, make_mesh, shard_stream
from gpu_bpe_tpu.pretok import PreTokenizer


def _pretok(text: str):
    return PreTokenizer().pre_tokenize(text)


def _oracle(data, starts, vocab_size):
    sym = bytes_to_symbols(data)
    if starts is not None:
        sym = tag_word_boundaries(sym, starts)
    return ReferenceTrainer().train(sym, target_vocab_size=vocab_size)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


class TestShardStream:
    def test_whole_words_per_shard(self):
        from gpu_bpe_tpu.constants import WORD_START_BIT
        from gpu_bpe_tpu.ops import make_stream

        data, starts = _pretok("alpha beta gamma delta epsilon zeta")
        stream = make_stream(data, starts, dedup=True)
        sym, w, n = shard_stream(stream.symbols[: stream.n], stream.weights[: stream.n], 4)
        assert sym.shape[0] == 4
        # every non-empty shard starts with a word-start symbol
        for d in range(4):
            if n[d]:
                assert sym[d, 0] & WORD_START_BIT
        # total valid symbols preserved
        assert n.sum() == stream.n


@pytest.mark.parametrize("n_dev", [2, 8])
def test_dist_matches_oracle(english_text, n_dev):
    data, starts = _pretok(english_text[:6000])
    oracle = _oracle(data, starts, 300)
    mesh = make_mesh(n_dev)
    dist = DistributedTrainer(mesh).train(data, starts, target_vocab_size=300)
    assert dist.merges == oracle.merges
    assert dist.merge_counts == oracle.merge_counts


def test_dist_matches_single_chip(english_text):
    from gpu_bpe_tpu.ops import TPUTrainer

    data, starts = _pretok(english_text[:4000])
    single = TPUTrainer().train(data, starts, target_vocab_size=290)
    dist = DistributedTrainer(make_mesh(8)).train(data, starts, target_vocab_size=290)
    assert dist.merges == single.merges


def test_dist_tiny_corpus_fallback_path(english_text):
    # near-uniform counts exercise the provable-bound fallback
    data = b"ab cd ab cd ef gh"
    starts = None
    oracle = _oracle(data, None, 280)
    dist = DistributedTrainer(make_mesh(4)).train(data, None, target_vocab_size=280, dedup=False)
    assert dist.merges == oracle.merges


def test_dist_flat_counts_tie_break_regression():
    """Flat count distributions make the sparse union bound useless: every
    shard's local top-(K+1) cutoff sums to more than the global max, and a
    tied pair outside the union once won with the wrong (larger) pair id.
    The dense all-gather fallback must kick in and keep the merge list
    bitwise equal to the oracle (regression for the sparse-recount bug)."""
    import random

    rng = random.Random(7)
    # hundreds of distinct words with identical frequencies -> tie storms
    words = [a + b + c for a in "abcdef" for b in "uvwxyz" for c in "mnop"]
    corpus = []
    for w in words:
        corpus += [w] * 4
    rng.shuffle(corpus)
    data, starts = _pretok(" ".join(corpus))
    oracle = _oracle(data, starts, 256 + 120)
    dist = DistributedTrainer(make_mesh(8)).train(data, starts, target_vocab_size=256 + 120)
    assert dist.merges == oracle.merges
    assert dist.merge_counts == oracle.merge_counts
