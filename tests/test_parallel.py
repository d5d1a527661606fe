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


def test_dist_64k_id_cap_early_stop(english_text):
    """The 64K-id cap (16-bit tokens, reference stop condition
    train.wgsl:345-348) through the DISTRIBUTED path: seed device state
    with next_id a few merges below 65,536 on a virtual mesh, run a batch,
    and require (a) early stop exactly at id 65,535 and (b) a merge log
    bitwise-equal to the single-chip step from the same seed."""
    import jax
    import jax.numpy as jnp

    from gpu_bpe_tpu.constants import BATCH_MERGES
    from gpu_bpe_tpu.ops import init_state, make_stream
    from gpu_bpe_tpu.ops.ingest import pad_stream
    from gpu_bpe_tpu.ops.train_step import train_batch
    from gpu_bpe_tpu.parallel.dist_train import (
        init_dist_state,
        make_dist_train_batch,
        shard_stream as dist_shard,
    )

    data, starts = _pretok(english_text[:8000])
    stream = make_stream(data, starts, dedup=True)
    start_id = 65_530  # 6 ids of room before the cap

    # single-chip
    padded = pad_stream(stream)
    st = init_state(jnp.asarray(padded.symbols), jnp.asarray(padded.weights),
                    stream.n, start_id)
    st = jax.jit(train_batch)(st, jnp.asarray(64, jnp.int32))
    done = int(st.merges_done)
    log_single = np.asarray(st.merge_log)[:done]
    assert bool(st.early_stop)
    assert done == 65_536 - start_id  # ids 65530..65535 assigned, then stop
    assert int(log_single[-1, 1]) == 65_535

    # distributed, 4-way
    mesh = make_mesh(4)
    sym_sh, w_sh, n_sh = dist_shard(stream.symbols[: stream.n],
                                    stream.weights[: stream.n], 4)
    dst = init_dist_state(mesh, sym_sh, w_sh, n_sh, start_id)
    batch_fn = jax.jit(make_dist_train_batch(mesh))
    dst = batch_fn(dst, jnp.asarray(64, jnp.int32))
    ddone = int(dst.merges_done)
    log_dist = np.asarray(dst.merge_log)[:ddone]
    assert bool(dst.early_stop)
    assert ddone == done
    np.testing.assert_array_equal(log_dist, log_single)
