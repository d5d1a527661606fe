"""Hugging Face tokenizer.json interop (core/hf_io.py).

Export: a trained model serialized as byte-level BPE must encode EXACTLY
like our merge-order reference encoder (tokenizer-manager.js semantics)
when loaded by the real `tokenizers` library. Import: a tokenizer.json
produced by the `tokenizers` library itself (arbitrary token ids, special
tokens) must round into a BPEModel that reproduces its ids.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

tokenizers = pytest.importorskip("tokenizers")

from gpu_bpe_tpu.core.encoder_ref import GreedyTrieEncoder, encode_merge_order
from gpu_bpe_tpu.core.hf_io import (
    bytes_to_unicode,
    model_from_hf_json,
    model_to_hf_json,
)
from gpu_bpe_tpu.core.model_io import BPEModel
from gpu_bpe_tpu.core.trainer_ref import ReferenceTrainer, bytes_to_symbols
from gpu_bpe_tpu.models.bpe import BPETokenizer

SAMPLE = (
    "the quick brown fox jumps over the lazy dog, the dog sleeps. "
    "hello hello world don't they'll we've naïve café 12345 aaaa bbbb "
    "москва 北京 🙂 mixed-CASE text with\nnewlines and   spaces"
)

PARITY_TEXTS = [
    "hello world",
    "the dog",
    "aaaa",  # overlap semantics: single-pass == lowest-rank-first
    "aaaaaaa",
    "don't stop",
    "naïve café 🙂",
    "x",
    "",
    "  leading spaces\nand\nnewlines  ",
    "北京москва",
]


@pytest.fixture(scope="module")
def trained_model() -> BPEModel:
    result = ReferenceTrainer().train(
        bytes_to_symbols(SAMPLE.encode("utf-8") * 4), target_vocab_size=310
    )
    assert len(result.merges) > 20
    return BPEModel(vocab=result.vocab, merges=result.merges)


class TestByteTable:
    def test_matches_tokenizers_alphabet(self):
        ours = set(bytes_to_unicode().values())
        theirs = set(tokenizers.pre_tokenizers.ByteLevel.alphabet())
        assert ours == theirs

    def test_bijection(self):
        table = bytes_to_unicode()
        assert len(table) == 256
        assert len(set(table.values())) == 256


class TestExport:
    def test_exact_merge_order_parity(self, trained_model):
        tok = tokenizers.Tokenizer.from_str(model_to_hf_json(trained_model))
        for text in PARITY_TEXTS + [SAMPLE]:
            expected = encode_merge_order(text.encode("utf-8"), trained_model.merges)
            got = tok.encode(text, add_special_tokens=False).ids
            assert got == expected, text

    def test_hf_decode_round_trips(self, trained_model):
        tok = tokenizers.Tokenizer.from_str(model_to_hf_json(trained_model))
        for text in PARITY_TEXTS:
            ids = tok.encode(text, add_special_tokens=False).ids
            assert tok.decode(ids) == text

    def test_byte_level_pretok_variant(self, trained_model):
        tok = tokenizers.Tokenizer.from_str(
            model_to_hf_json(trained_model, pretok="byte-level")
        )
        # per-word (no split points inside): identical to merge-order BPE
        for word in ("hello", "the", "dog", "aaaa"):
            expected = encode_merge_order(word.encode("utf-8"), trained_model.merges)
            assert tok.encode(word, add_special_tokens=False).ids == expected

    def test_duplicate_byte_sequences_rejected(self):
        vocab = [bytes([b]) for b in range(256)] + [b"ab", b"ab"]
        model = BPEModel(vocab=vocab, merges=[(ord("a"), ord("b"), 256)])
        with pytest.raises(ValueError, match="duplicate"):
            model_to_hf_json(model)

    def test_inconsistent_merge_rejected(self):
        vocab = [bytes([b]) for b in range(256)] + [b"xy"]
        model = BPEModel(vocab=vocab, merges=[(ord("a"), ord("b"), 256)])
        with pytest.raises(ValueError, match="merge"):
            model_to_hf_json(model)


class TestImportRoundTrip:
    def test_export_import_identity(self, trained_model):
        model2, extras = model_from_hf_json(model_to_hf_json(trained_model))
        assert model2.vocab == trained_model.vocab
        assert [tuple(m) for m in model2.merges] == [
            tuple(m) for m in trained_model.merges
        ]
        assert model2.byte_ids is None  # canonical layout preserved
        assert extras["missing_byte_tokens"] == []
        assert extras["pre_split_regex"] is False

    def test_bpemodel_from_json_autodetects(self, trained_model, tmp_path):
        p = tmp_path / "tokenizer.json"
        p.write_text(model_to_hf_json(trained_model), encoding="utf-8")
        model2 = BPEModel.load(str(p))
        assert model2.vocab == trained_model.vocab


@pytest.fixture(scope="module")
def hf_trained():
    """A tokenizer.json trained by the tokenizers library itself: special
    token at id 0 and the byte alphabet NOT at ids 0-255."""
    tok = tokenizers.Tokenizer(tokenizers.models.BPE())
    tok.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = tokenizers.decoders.ByteLevel()
    trainer = tokenizers.trainers.BpeTrainer(
        vocab_size=350,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=tokenizers.pre_tokenizers.ByteLevel.alphabet(),
        show_progress=False,
    )
    tok.train_from_iterator([SAMPLE] * 4, trainer)
    return tok


class TestImportEcosystem:
    def test_ids_preserved_per_word(self, hf_trained):
        model, extras = model_from_hf_json(hf_trained.to_str())
        ours = BPETokenizer(model, backend="cpu")
        assert model.byte_ids is not None  # shuffled alphabet detected
        for word in ("hello", "the", "dog", "jumps", "world", "aaaa", "café"):
            theirs = hf_trained.encode(word, add_special_tokens=False).ids
            assert ours.encode(word) == theirs, word

    def test_special_token_bytes_kept(self, hf_trained):
        model, extras = model_from_hf_json(hf_trained.to_str())
        ids = [t["id"] for t in extras["added_tokens"]]
        assert ids and model.vocab[ids[0]] == b"<|endoftext|>"

    def test_greedy_and_decode_work(self, hf_trained):
        model, _ = model_from_hf_json(hf_trained.to_str())
        enc = GreedyTrieEncoder(model.vocab)
        data = b"the quick brown fox hello world"
        toks = enc.encode(data)
        out = b"".join(bytes(model.vocab[t]) for t in np.asarray(toks))
        assert out == data

    def test_pre_split_regex_reported(self, hf_trained):
        _, extras = model_from_hf_json(hf_trained.to_str())
        assert extras["pre_split_regex"] is True


class TestImportErrors:
    def test_rejects_non_bpe(self):
        blob = json.dumps({"model": {"type": "Unigram", "vocab": []}})
        with pytest.raises(ValueError, match="Unigram"):
            model_from_hf_json(blob)

    def test_rejects_wordpiece_prefix(self):
        blob = json.dumps(
            {
                "model": {
                    "type": "BPE",
                    "vocab": {"a": 0},
                    "merges": [],
                    "continuing_subword_prefix": "##",
                }
            }
        )
        with pytest.raises(ValueError, match="byte-level"):
            model_from_hf_json(blob)

    def test_rejects_non_byte_alphabet(self):
        blob = json.dumps(
            {"model": {"type": "BPE", "vocab": {"あ": 0}, "merges": []}}
        )
        with pytest.raises(ValueError, match="byte-level"):
            model_from_hf_json(blob)

    def test_missing_bytes_reported(self):
        table = bytes_to_unicode()
        blob = json.dumps(
            {"model": {"type": "BPE", "vocab": {table[ord("a")]: 0}, "merges": []}}
        )
        model, extras = model_from_hf_json(blob)
        assert len(extras["missing_byte_tokens"]) == 255
        # raw-byte fallback: unmapped bytes keep their byte value
        assert encode_merge_order(b"ab", [], byte_ids=model.byte_ids) == [0, ord("b")]


class TestCLI:
    def test_export_hf_cli(self, trained_model, tmp_path):
        from gpu_bpe_tpu.cli import main

        mp = tmp_path / "model.json"
        trained_model.save(str(mp))
        out = tmp_path / "tokenizer.json"
        assert main(["export-hf", str(mp), "-o", str(out)]) == 0
        tok = tokenizers.Tokenizer.from_str(out.read_text(encoding="utf-8"))
        assert (
            tok.encode("hello world", add_special_tokens=False).ids
            == encode_merge_order(b"hello world", trained_model.merges)
        )
