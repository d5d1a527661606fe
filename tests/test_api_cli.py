"""High-level API + CLI tests (CPU backend for speed)."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from gpu_bpe_tpu.api import TrainConfig, build_corpus, train
from gpu_bpe_tpu.models import BPETokenizer


class TestAPI:
    def test_train_cpu_backend(self, english_text):
        tok, result = train(english_text[:5000], TrainConfig(vocab_size=300, backend="cpu",
                                                             show_progress=False))
        assert tok.vocab_size == result.vocab_size >= 256
        tokens = tok.encode("the quick brown fox")
        assert tok.decode(tokens) == b"the quick brown fox"

    def test_train_tpu_backend(self, english_text):
        tok, result = train(english_text[:5000], TrainConfig(vocab_size=300, backend="tpu",
                                                             show_progress=False))
        assert len(result.merges) > 0

    def test_backends_agree(self, english_text):
        cfg = dict(vocab_size=290, show_progress=False)
        _, r_cpu = train(english_text[:4000], TrainConfig(backend="cpu", **cfg))
        _, r_tpu = train(english_text[:4000], TrainConfig(backend="tpu", **cfg))
        _, r_dist = train(english_text[:4000], TrainConfig(backend="dist", **cfg))
        assert r_cpu.merges == r_tpu.merges == r_dist.merges

    def test_byte_level_mode(self, english_text):
        cfg = dict(vocab_size=280, pre_tokenize=False, show_progress=False)
        _, r_cpu = train(english_text[:3000], TrainConfig(backend="cpu", **cfg))
        _, r_tpu = train(english_text[:3000], TrainConfig(backend="tpu", **cfg))
        assert r_cpu.merges == r_tpu.merges

    def test_build_corpus_separators(self):
        corpus = build_corpus([b"aaa", b"bbb"])
        assert corpus == b"aaa\n\nbbb"

    def test_build_corpus_shuffle_deterministic(self):
        files = [f"para{i}".encode() for i in range(10)]
        c1 = build_corpus(files, shuffle=True, seed=1)
        c2 = build_corpus(files, shuffle=True, seed=1)
        assert c1 == c2
        assert sorted(c1.split(b"\n\n")) == sorted(build_corpus(files).split(b"\n\n"))

    def test_model_roundtrip_via_tokenizer(self, english_text, tmp_path):
        tok, _ = train(english_text[:4000], TrainConfig(vocab_size=280, backend="cpu",
                                                        show_progress=False))
        p = tmp_path / "m.json"
        tok.save(str(p))
        tok2 = BPETokenizer.load(str(p), backend="cpu")
        text = "hello don't stop"
        assert tok2.encode(text) == tok.encode(text)


def _run_cli(*args, env_cpu=True):
    import os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "gpu_bpe_tpu.cli", *args],
        capture_output=True, text=True, env=env, cwd=str(Path(__file__).parent.parent),
        timeout=600,
    )


@pytest.mark.slow
class TestCLI:
    def test_full_cli_flow(self, english_text, tmp_path):
        corpus = tmp_path / "corpus.txt"
        corpus.write_text(english_text[:8000])
        model = tmp_path / "model.json"

        r = _run_cli("train", str(corpus), "-o", str(model), "--vocab-size", "300",
                     "--backend", "cpu")
        assert r.returncode == 0, r.stderr
        assert model.exists()
        obj = json.loads(model.read_text())
        assert obj["version"] == 1 and obj["vocabSize"] == 300

        r = _run_cli("encode", str(model), "the quick brown fox")
        assert r.returncode == 0, r.stderr
        tokens = [int(t) for t in r.stdout.split()]
        r = _run_cli("decode", str(model), *[str(t) for t in tokens])
        assert r.stdout.strip() == "the quick brown fox"

        trie = tmp_path / "model.trie"
        r = _run_cli("export-trie", str(model), "-o", str(trie))
        assert r.returncode == 0 and trie.exists()

        out_bin = tmp_path / "tokens.bin"
        r = _run_cli("export-bin", str(model), str(corpus), "-o", str(out_bin),
                     "--backend", "cpu")
        assert r.returncode == 0, r.stderr

        r = _run_cli("inspect", str(out_bin))
        assert r.returncode == 0 and "DXFT v2" in r.stdout

        r = _run_cli("vocab", str(model))
        assert r.returncode == 0 and r.stdout.startswith("# GPU BPE Vocabulary")


def test_collect_files_recursive(tmp_path):
    """Directory ingestion with the reference's text-extension filter
    (file-input-controller.js:163-241, utils.js:8-18)."""
    from gpu_bpe_tpu.api import collect_files

    (tmp_path / "sub").mkdir()
    (tmp_path / "a.txt").write_text("hello")
    (tmp_path / "sub" / "b.py").write_text("code")
    (tmp_path / "sub" / "c.bin").write_bytes(b"\x00binary")  # filtered out
    (tmp_path / "noext").write_text("skip")  # no extension -> filtered
    got = collect_files([str(tmp_path)])
    names = sorted(p.rsplit("/", 1)[-1] for p in got)
    assert names == ["a.txt", "b.py"]
    # explicit file always included, even with a non-text extension
    explicit = collect_files([str(tmp_path / "sub" / "c.bin")])
    assert explicit == [str(tmp_path / "sub" / "c.bin")]


def test_collect_files_directory_order_deterministic(tmp_path, monkeypatch):
    """Subdirectory traversal must be sorted, not filesystem-order, so the
    corpus (hence the merge list) is identical across machines."""
    import os

    from gpu_bpe_tpu.api import collect_files

    for d in ("zz", "aa", "mm"):
        (tmp_path / d).mkdir()
        (tmp_path / d / "f.txt").write_text(d)

    real_walk = os.walk

    def shuffled_walk(p, **kw):
        for root, dirs, names in real_walk(p, **kw):
            dirs.reverse()  # simulate a hostile filesystem order
            yield root, dirs, names

    monkeypatch.setattr(os, "walk", shuffled_walk)
    got = [p.rsplit("/", 2)[-2] for p in collect_files([str(tmp_path)])]
    assert got == ["aa", "mm", "zz"]


def test_make_stream_int32_weight_guard(monkeypatch):
    """make_stream must refuse word counts that overflow int32 weights
    instead of silently wrapping (regression: unguarded astype(int32)).
    The numpy path asserts via _unique_rows; the native path (C++ loader)
    is pinned separately below."""
    import numpy as np
    import pytest

    from gpu_bpe_tpu.ops import ingest, native

    # numpy path: force it, then inflate counts past int32
    monkeypatch.setenv("GPU_BPE_TPU_NO_NATIVE_INGEST", "1")
    native._raw_lib.cache_clear()
    real_unique_rows = ingest._unique_rows

    def huge_unique(mat, weights=None):
        uniq, cnt = real_unique_rows(mat, weights)
        return uniq, cnt + np.int64(2**31)

    monkeypatch.setattr(ingest, "_unique_rows", huge_unique)
    data = np.frombuffer(b"aaa bbb aaa ", dtype=np.uint8)
    starts = np.zeros(len(data), dtype=np.uint8)
    starts[[0, 4, 8]] = 1
    try:
        with pytest.raises(AssertionError, match="overflows int32"):
            ingest.make_stream(data, starts, dedup=True)
    finally:
        monkeypatch.delenv("GPU_BPE_TPU_NO_NATIVE_INGEST")
        native._raw_lib.cache_clear()


def test_native_ingest_int32_weight_guard(monkeypatch):
    """The binder must surface the C++ loader's rc=-2 overflow signal as
    the same AssertionError the numpy path raises (2^31 real repetitions
    needs a 2 GB corpus, so the C return code is stubbed)."""
    import numpy as np
    import pytest

    from gpu_bpe_tpu.ops import native

    if not native.native_available():
        pytest.skip("native ingest unavailable")

    monkeypatch.setattr(native, "_lib", lambda: (lambda *a: -2))
    with pytest.raises(AssertionError, match="overflows int32"):
        native.native_dedup(
            np.frombuffer(b"ab", np.uint8), np.array([1, 0], np.uint8), 0x10000
        )
