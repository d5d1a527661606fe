"""64 MB / 8192-merge certificate soundness validation (CLAUDE.md recipe).

Trains the same 64 MB corpus three ways and requires BITWISE-identical
merge lists + counts:

1. normal lazy-candidate path (dual/triple certificate, sampled exclusion)
2. the same corpus with permuted word order (merge list must not depend
   on stream order beyond the deterministic tie-break)
3. ground truth in a SEPARATE process with GPU_BPE_TPU_FORCE_RECOUNT=1
   (every merge a full sort-based recount; the window/dual fast paths
   never fire). A separate process because JAX memoizes traces on
   function identity — monkeypatching after a first trace is silently
   ignored.

Writes docs/artifacts/certificate_validation.json. Historic certificate
bugs (f32 histogram slack, DMA tail garbage) appeared ONLY at this scale;
run after ANY certificate or kernel change.

    python scripts/validate_certificate.py [--mb 64] [--merges 8192]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_CHILD = """
import sys, json, hashlib
sys.path.insert(0, {repo!r})
if {cpu}:
    import jax
    jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
import numpy as np
from bench import synth_corpus
from gpu_bpe_tpu.utils import enable_compile_cache
enable_compile_cache()
from gpu_bpe_tpu.ops import TPUTrainer, make_stream
from gpu_bpe_tpu.pretok import PreTokenizer

corpus = synth_corpus({mb} << 20)
pt = PreTokenizer()
data, starts = pt.pre_tokenize_bytes(corpus)
stream = make_stream(data, starts, dedup=True)
if {permute}:
    # permute unique-word order: per-word blocks shuffled deterministically
    rng = np.random.default_rng(1234)
    starts_mask = (stream.symbols >> 16) & 1
    word_ids = np.cumsum(starts_mask) - 1
    n_words = int(word_ids[-1]) + 1 if len(word_ids) else 0
    perm = rng.permutation(n_words)
    order = np.argsort(perm[word_ids], kind="stable")
    stream = type(stream)(
        stream.symbols[order].copy(), stream.weights[order].copy(),
        stream.n, stream.total_bytes,
    )
result = TPUTrainer().train_stream(stream, target_vocab_size=256 + {merges})
blob = json.dumps([[a, b, c] for a, b, c in result.merges]).encode()
cblob = json.dumps(result.merge_counts).encode()
print(json.dumps({{
    "merges": len(result.merges),
    "sha_merges": hashlib.sha256(blob).hexdigest(),
    "sha_counts": hashlib.sha256(cblob).hexdigest(),
    "train_s": round(result.training_time_s, 2),
}}))
"""


def run_child(mb: int, merges: int, permute: bool, force_recount: bool,
              cpu: bool = False) -> dict:
    env = dict(os.environ)
    env.pop("GPU_BPE_TPU_FORCE_RECOUNT", None)
    if force_recount:
        env["GPU_BPE_TPU_FORCE_RECOUNT"] = "1"
    code = _CHILD.format(repo=str(REPO), mb=mb, merges=merges, permute=permute,
                         cpu=cpu)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=7200,
    )
    if r.returncode != 0:
        print(r.stderr[-3000:], file=sys.stderr)
        raise SystemExit(f"child failed (force_recount={force_recount})")
    out = json.loads(r.stdout.strip().splitlines()[-1])
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--merges", type=int, default=8192)
    ap.add_argument("--out", default="docs/artifacts/certificate_validation.json")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend (mid-scale check when the TPU "
                         "tunnel is down; the 64 MB TPU run remains mandatory "
                         "for kernel-lowering coverage)")
    args = ap.parse_args()

    print(f"[1/3] normal path ({args.mb} MB, {args.merges} merges)", file=sys.stderr)
    normal = run_child(args.mb, args.merges, permute=False, force_recount=False,
                       cpu=args.cpu)
    print(json.dumps(normal), file=sys.stderr)

    print("[2/3] permuted word order", file=sys.stderr)
    permuted = run_child(args.mb, args.merges, permute=True, force_recount=False,
                         cpu=args.cpu)
    print(json.dumps(permuted), file=sys.stderr)

    print("[3/3] FORCE_RECOUNT ground truth (separate process)", file=sys.stderr)
    truth = run_child(args.mb, args.merges, permute=False, force_recount=True,
                      cpu=args.cpu)
    print(json.dumps(truth), file=sys.stderr)

    ok = (
        normal["sha_merges"] == truth["sha_merges"] == permuted["sha_merges"]
        and normal["sha_counts"] == truth["sha_counts"] == permuted["sha_counts"]
        and normal["merges"] == truth["merges"] == args.merges
    )
    artifact = {
        "ok": ok,
        "corpus_mb": args.mb,
        "merges": args.merges,
        "normal": normal,
        "permuted_word_order": permuted,
        "force_recount_ground_truth": truth,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True
        ).stdout.strip(),
    }
    os.makedirs(Path(args.out).parent, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps(artifact))
    if not ok:
        raise SystemExit("BITWISE MISMATCH — certificate unsound, do not ship")


if __name__ == "__main__":
    main()
