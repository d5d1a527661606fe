"""Bisect the deterministic 10 GB train crash (ROADMAP item 14).

Training on the 10 GB corpus dies with "TPU worker process crashed or
restarted" at merge 17,573 (batch 19, 2^25 capacity rung, n=21,039,156) —
same index across two kernel generations. This script localizes it:

  phase ``ingest``  — stream-ingest the corpus once and cache the deduped
                      SymbolStream as an .npz (skips ~8 min on re-runs);
  phase ``train``   — run the trainer loop with full TrainState snapshots
                      near the crash region (kept on disk, last N);
  phase ``resume``  — restore a snapshot and continue with a configurable
                      per-dispatch merge count (1 = exact failing iteration),
                      under whatever env flags (GPU_BPE_TPU_NO_PALLAS,
                      GPU_BPE_TPU_FORCE_RECOUNT) the caller sets.

    python scripts/bisect_10gb.py ingest
    python scripts/bisect_10gb.py train --snap-from 15500
    python scripts/bisect_10gb.py resume --snap /tmp/bisect_snap_18.npz --step 1
    GPU_BPE_TPU_NO_PALLAS=1 python scripts/bisect_10gb.py resume --snap ...

Every batch line is flushed so a worker crash leaves the exact position in
the log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

STREAM_NPZ = "/tmp/stream_10gb_dedup.npz"
CORPUS = "/tmp/stream_corpus_10gb.txt"


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def do_ingest(args) -> None:
    from gpu_bpe_tpu.ops.ingest import make_stream_chunked, stream_paths

    t0 = time.time()
    stream = make_stream_chunked(stream_paths([args.corpus]))
    log(f"ingest done in {time.time() - t0:.0f}s: n={stream.n} "
        f"total={stream.total_bytes} ({stream.dedup_ratio:.1f}x)")
    np.savez(STREAM_NPZ, symbols=stream.symbols[: stream.n],
             weights=stream.weights[: stream.n],
             n=stream.n, total_bytes=stream.total_bytes)
    log(f"saved {STREAM_NPZ}")


def load_stream():
    from gpu_bpe_tpu.ops.ingest import SymbolStream

    z = np.load(STREAM_NPZ)
    return SymbolStream(symbols=z["symbols"], weights=z["weights"],
                        n=int(z["n"]), total_bytes=int(z["total_bytes"]))


def save_state(state, path: str, total_done: int) -> None:
    t0 = time.time()
    arrs = {f: np.asarray(getattr(state, f)) for f in state._fields}
    np.savez(path, total_done=total_done, **arrs)
    log(f"  snapshot {path} ({time.time() - t0:.0f}s, cap={arrs['symbols'].shape[0]})")


def load_state(path: str):
    import jax.numpy as jnp

    from gpu_bpe_tpu.ops.train_step import TrainState

    z = np.load(path)
    fields = {f: jnp.asarray(z[f]) for f in TrainState._fields}
    return TrainState(**fields), int(z["total_done"])


def mem_stats() -> str:
    try:
        import jax

        s = jax.local_devices()[0].memory_stats()
        if s:
            return f"dev_mem={s.get('bytes_in_use', 0) >> 20}MB/{s.get('bytes_limit', 0) >> 20}MB"
    except Exception:
        pass
    return ""


def run_loop(state, total_done: int, args) -> None:
    """The TPUTrainer.train_stream device loop, instrumented."""
    import jax.numpy as jnp

    from gpu_bpe_tpu.constants import BATCH_MERGES, TOKEN_MASK
    from gpu_bpe_tpu.ops.train_step import train_batch_summary_jit
    from gpu_bpe_tpu.ops.trainer import _recount_budget

    _MIN_CAP = 2048
    merges_needed = args.vocab - 256
    step = args.step or BATCH_MERGES
    batches_run = 0
    early_stop = False
    merge_rows = []
    t_start = time.time()
    while total_done < merges_needed and not early_stop:
        batch = min(step, merges_needed - total_done)
        cap = state.symbols.shape[0]
        t0 = time.time()
        budget = 1 << 30 if args.no_budget else _recount_budget(cap)
        state, packed_dev = train_batch_summary_jit(
            state, jnp.asarray(batch, jnp.int32), jnp.asarray(budget, jnp.int32))
        packed = np.asarray(packed_dev)
        dt = time.time() - t0
        log_arr = packed[: BATCH_MERGES * 3].reshape(BATCH_MERGES, 3)
        merges_done = int(packed[-4])
        n_now = int(np.int32(packed[-3]))
        early_stop = bool(packed[-2])
        recounts = int(packed[-1])
        for i in range(merges_done):
            pair, new_id, count = int(log_arr[i, 0]), int(log_arr[i, 1]), int(log_arr[i, 2])
            merge_rows.append((pair >> 16, pair & TOKEN_MASK, new_id, count))
        total_done += merges_done
        log(f"batch {batches_run}: +{merges_done} -> {total_done} merges, "
            f"n={n_now} cap={cap} recounts={recounts} {dt:.1f}s {mem_stats()}")

        new_cap = cap
        while new_cap > _MIN_CAP and n_now + 32 <= new_cap // 2:
            new_cap //= 2
        if new_cap != cap:
            state = state._replace(symbols=state.symbols[:new_cap],
                                   weights=state.weights[:new_cap])
            log(f"  shrink {cap} -> {new_cap}")

        batches_run += 1
        if args.snap_from is not None and total_done >= args.snap_from:
            path = f"/tmp/bisect_snap_{total_done}.npz"
            save_state(state, path, total_done)
            # keep only the newest --keep snapshots
            snaps = sorted(Path("/tmp").glob("bisect_snap_*.npz"),
                           key=lambda p: p.stat().st_mtime)
            for old in snaps[: -args.keep]:
                old.unlink()
    log(f"DONE: {total_done} merges in {time.time() - t_start:.0f}s, early_stop={early_stop}")
    if args.merges_out:
        with open(args.merges_out, "w") as f:
            json.dump(merge_rows, f)
        log(f"merge rows -> {args.merges_out}")


def do_train(args) -> None:
    import jax.numpy as jnp

    from gpu_bpe_tpu.ops.ingest import pad_stream
    from gpu_bpe_tpu.ops.train_step import init_state

    stream = load_stream()
    padded = pad_stream(stream)
    log(f"stream n={stream.n}, padded cap={len(padded.symbols)}")
    state = init_state(jnp.asarray(padded.symbols), jnp.asarray(padded.weights),
                       stream.n, 256)
    _ = np.asarray(state.symbols[0])
    log(f"state uploaded {mem_stats()}")
    run_loop(state, 0, args)


def do_resume(args) -> None:
    state, total_done = load_state(args.snap)
    log(f"resumed {args.snap}: total_done={total_done}, "
        f"cap={state.symbols.shape[0]}, n={int(np.asarray(state.n))} "
        f"pallas={'off' if os.environ.get('GPU_BPE_TPU_NO_PALLAS') else 'on'}")
    run_loop(state, total_done, args)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("phase", choices=["ingest", "train", "resume"])
    ap.add_argument("--corpus", default=CORPUS)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--snap-from", type=int, default=None,
                    help="snapshot every batch once total merges >= this")
    ap.add_argument("--keep", type=int, default=3)
    ap.add_argument("--snap", default=None, help="snapshot to resume from")
    ap.add_argument("--step", type=int, default=None,
                    help="merges per dispatch (default BATCH_MERGES)")
    ap.add_argument("--merges-out", default=None)
    ap.add_argument("--no-budget", action="store_true",
                    help="disable the recount budget (reproduce the crash)")
    args = ap.parse_args()
    if args.phase == "ingest":
        do_ingest(args)
    elif args.phase == "train":
        do_train(args)
    else:
        do_resume(args)


if __name__ == "__main__":
    main()
