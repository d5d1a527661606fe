"""Multi-host process boundary: a REAL 2-process jax.distributed launch.

The reference actually crosses a process boundary for training (a Web
Worker with its own GPUDevice, bpe-worker.js:29-35). The TPU-native
equivalent is JAX multi-process SPMD; this test launches two OS processes
on the CPU backend (gloo collectives — the same shard_map program that
rides ICI/DCN on a pod, 2 virtual devices per process = 4 global shards)
via the real CLI entry point and asserts the trained merge list is
bitwise-identical across ranks AND to a single-process run.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import sys
from gpu_bpe_tpu.parallel.multihost import init_multihost
rank, nproc = init_multihost(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
    platform="cpu",
    local_device_count=2,
)
import jax
assert jax.process_count() == int(sys.argv[2]), jax.process_count()
assert jax.device_count() == 2 * int(sys.argv[2]), jax.devices()

import json
from gpu_bpe_tpu.api import TrainConfig, train

corpus = open(sys.argv[4], "rb").read()
config = TrainConfig(vocab_size=int(sys.argv[6]), backend="dist", show_progress=False)
_tok, result = train(corpus, config)
with open(sys.argv[5] + f".rank{rank}", "w") as f:
    json.dump({"merges": result.merges, "counts": result.merge_counts,
               "recounts": result.recounts, "duals": result.duals}, f)
from gpu_bpe_tpu.parallel.multihost import shutdown_multihost
shutdown_multihost()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


VOCAB_SIZE = 256 + 288  # deep enough for recounts AND dual-merge fires


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    # Zipf-ish text over syllable-composed words: enough distinct pair
    # structure that a 288-merge run exercises the full window machinery
    # (certificate failures -> recounts; strict second winners -> duals)
    rng = np.random.default_rng(7)
    syll = [a + b for a in "btkdsmnlr" for b in ("a", "e", "i", "o", "ar", "en", "on")]
    words = ["".join(syll[i] for i in rng.integers(0, len(syll), size=k))
             for k in rng.integers(1, 5, size=2000)]
    ranks = np.arange(1, len(words) + 1, dtype=np.float64) ** -1.05
    ranks /= ranks.sum()
    text = " ".join(words[i] for i in rng.choice(len(words), size=30000, p=ranks))
    p = tmp_path_factory.mktemp("mh") / "corpus.txt"
    p.write_text(text)
    return p


def test_two_process_train_bitwise(tmp_path, corpus_file):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    out = tmp_path / "result.json"

    env = dict(os.environ, PYTHONPATH=str(REPO))
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(rank),
             str(corpus_file), str(out), str(VOCAB_SIZE)],
            cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in outs:
        assert rc == 0, stderr.decode()[-3000:]

    r0 = json.loads((tmp_path / "result.json.rank0").read_text())
    r1 = json.loads((tmp_path / "result.json.rank1").read_text())
    assert r0 == r1, "ranks disagree on the merge list"
    assert len(r0["merges"]) >= 256, "training barely ran"

    # the cross-PROCESS run must actually exercise the window machinery's
    # collective corners, not just happy-path certified merges: at least
    # one full recount beyond the forced initial one, and at least one
    # dual-merge fire (second winner certified across the process boundary)
    assert r0["recounts"] >= 2, f"recounts={r0['recounts']}: window never failed over"
    assert r0["duals"] >= 1, f"duals={r0['duals']}: dual-merge never fired cross-process"

    # single-process ground truth on the in-test 8-device virtual mesh:
    # merge lists are invariant across process AND shard counts
    from gpu_bpe_tpu.api import TrainConfig, train

    _tok, ref = train(corpus_file.read_bytes(),
                      TrainConfig(vocab_size=VOCAB_SIZE, backend="dist",
                                  show_progress=False))
    assert [tuple(m) for m in r0["merges"]] == [tuple(m) for m in ref.merges]
    assert r0["counts"] == ref.merge_counts
