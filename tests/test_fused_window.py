"""Fused-window iteration (train_step._one_merge_fused) conformance.

The fused structure is the single-chip TPU default; CI runs it on the CPU
backend with every Pallas kernel in interpret mode. ``lax.while_loop``
around interpret-mode kernels is pathologically slow, so the worker drives
``_one_merge_fused`` one dispatch per merge (the while-loop plumbing —
batch counting, collapse stop, recount budget — is covered by the jnp-path
tests; the window/certificate machinery is identical either way).

Subprocess isolation: GPU_BPE_TPU_PALLAS_INTERPRET is read once and cached
at trace time (monkeypatching would be ignored by memoized traces —
CLAUDE.md invariant 4).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from gpu_bpe_tpu.ops import init_state, make_stream
from gpu_bpe_tpu.ops.ingest import pad_stream
from gpu_bpe_tpu.ops.train_step import _one_merge_fused
from gpu_bpe_tpu.constants import TOKEN_MASK

data = open(sys.argv[1], "rb").read()
starts = np.zeros(len(data), np.uint8)
for i in range(len(data)):
    if i == 0 or data[i-1:i] == b" ":
        starts[i] = 1
stream = make_stream(data, starts, dedup=True)
padded = pad_stream(stream)
state = init_state(jnp.asarray(padded.symbols), jnp.asarray(padded.weights),
                   stream.n, 256)
step = jax.jit(lambda s: _one_merge_fused(s, jnp.asarray(4096, jnp.int32)))
merges = []
for _ in range(int(sys.argv[3])):
    state = step(state)
    if bool(state.early_stop):
        break
    log = np.asarray(state.merge_log)
    i = int(state.merges_done) - 1
    pair, nid, cnt = int(log[i, 0]), int(log[i, 1]), int(log[i, 2])
    merges.append([pair >> 16, pair & TOKEN_MASK, nid, cnt])
json.dump({"merges": merges, "recounts": int(state.recounts),
           "cap": int(state.symbols.shape[0])},
          open(sys.argv[2], "w"))
"""


def _oracle(data: bytes, starts, vocab_size: int):
    from gpu_bpe_tpu.core import ReferenceTrainer, bytes_to_symbols, tag_word_boundaries

    sym = bytes_to_symbols(data)
    sym = tag_word_boundaries(sym, starts)
    return ReferenceTrainer().train(sym, target_vocab_size=vocab_size)


def _run_worker(tmp_path, corpus: bytes, n_merges: int, env_extra=None, patch=""):
    import numpy as np

    repo = Path(__file__).resolve().parent.parent
    w = tmp_path / "fused_worker.py"
    if patch:
        # insert module patches after the jax platform pin, before tracing
        head, sep, tail = _WORKER.partition('import numpy as np')
        w.write_text(head + patch + sep + tail)
    else:
        w.write_text(_WORKER)
    c = tmp_path / "c.txt"
    c.write_bytes(corpus)
    out = tmp_path / "out.json"
    env = dict(os.environ, PYTHONPATH=str(repo),
               GPU_BPE_TPU_PALLAS_INTERPRET="1", **(env_extra or {}))
    p = subprocess.run(
        [sys.executable, str(w), str(c), str(out), str(n_merges)],
        env=env, capture_output=True, timeout=900,
    )
    assert p.returncode == 0, p.stderr.decode()[-2000:]
    got = json.loads(out.read_text())
    starts = np.zeros(len(corpus), np.uint8)
    for i in range(len(corpus)):
        if i == 0 or corpus[i - 1 : i] == b" ":
            starts[i] = 1
    return got, starts


def test_fused_vs_oracle(tmp_path):
    corpus = (b"the cat sat on the mat the cat ran to the hat "
              b"a tailor tells a tall tale to the little cat ") * 6
    got, starts = _run_worker(tmp_path, corpus, 60)
    oracle = _oracle(corpus, starts, 256 + 60)
    exp = [[a, b, nid] for (a, b, nid) in oracle.merges]
    assert [m[:3] for m in got["merges"]] == exp[: len(got["merges"])]
    assert [m[3] for m in got["merges"]] == oracle.merge_counts[: len(got["merges"])]
    assert len(got["merges"]) >= 30  # the corpus supports a real window
    assert got["recounts"] < len(got["merges"])  # the certificate actually fired


def test_fused_force_recount_bitwise(tmp_path):
    """FORCE_RECOUNT ground truth through the FUSED structure must match
    the certified fast path bitwise (invariant 4, CI-scale)."""
    corpus = (b"banana bandana ananas cabana banal canal "
              b"the thin moth then that math lathe ") * 8
    fast, _ = _run_worker(tmp_path, corpus, 50)
    slow, _ = _run_worker(tmp_path, corpus, 50,
                          env_extra={"GPU_BPE_TPU_FORCE_RECOUNT": "1"})
    assert fast["merges"] == slow["merges"]
    assert slow["recounts"] == len(slow["merges"]) + 1  # every pass recounted


_SEG_WORKER_PATCH = """
import gpu_bpe_tpu.ops.train_step as _ts
_ts._SEG_RECOUNT_MIN_CAP = 1 << 12
_ts._SEG_RECOUNT_M = 1 << 10
"""


def test_segmented_recount_bitwise(tmp_path):
    """The two-level segmented recount (round 5, large-capacity path) must
    produce bitwise-identical merge lists to the monolithic recount. The
    worker lowers the capacity gate so CI exercises it, and runs under
    FORCE_RECOUNT so EVERY merge takes the recount path."""
    # the stream is DEDUPed, so the gate needs many distinct words: the
    # padded capacity must clear the (lowered) 2^12 segmented threshold
    import numpy as np

    rng = np.random.default_rng(11)
    syll = [a + b for a in "btkdsmnlr" for b in "aeiou"]
    words = ["".join(syll[i] for i in rng.integers(0, len(syll), size=k))
             for k in rng.integers(2, 5, size=1500)]
    corpus = " ".join(words[i] for i in rng.integers(0, len(words), size=4000)).encode()
    plain, _ = _run_worker(tmp_path, corpus, 80,
                           env_extra={"GPU_BPE_TPU_FORCE_RECOUNT": "1",
                                      "GPU_BPE_TPU_SEG_RECOUNT": "0"})
    tmp2 = tmp_path / "seg"
    tmp2.mkdir()
    seg, _ = _run_worker(tmp2, corpus, 80,
                         env_extra={"GPU_BPE_TPU_FORCE_RECOUNT": "1"},
                         patch=_SEG_WORKER_PATCH)
    assert seg["merges"] == plain["merges"]
    assert seg["recounts"] == plain["recounts"]
    # the segmented path must actually have engaged (patched gate: 2^12)
    assert seg["cap"] >= (1 << 12) and seg["cap"] % (1 << 10) == 0, seg["cap"]
