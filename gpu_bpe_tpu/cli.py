"""Command-line interface.

The framework's replacement for the reference's browser UI (src/ui/):

  python -m gpu_bpe_tpu.cli train   corpus1.txt corpus2.txt -o model.json \\
      --vocab-size 8192 --backend tpu --shuffle
  python -m gpu_bpe_tpu.cli encode  model.json "some text"
  python -m gpu_bpe_tpu.cli decode  model.json 104 105
  python -m gpu_bpe_tpu.cli export-bin  model.json corpus.txt -o tokens.bin
  python -m gpu_bpe_tpu.cli export-trie model.json -o model.trie
  python -m gpu_bpe_tpu.cli vocab   model.json
  python -m gpu_bpe_tpu.cli inspect tokens.bin
"""

from __future__ import annotations

import argparse
import sys
import time

from .constants import BATCH_MERGES
from .api import (
    TrainConfig, collect_files, export_bin, export_trie, load_model, train, train_files,
)
from .utils.timing import format_size


def _read_files(paths: list[str]) -> list[bytes]:
    """Read files; directories recurse with the text-extension filter."""
    out = []
    for p in collect_files(paths):
        with open(p, "rb") as f:
            out.append(f.read())
    return out


def cmd_train(args) -> int:
    import os

    # multi-host launch: federate devices BEFORE any backend touch; every
    # process runs this same command (see parallel/multihost.py recipe)
    from .parallel.multihost import init_multihost, multihost_requested, shutdown_multihost

    multihost = multihost_requested(args)
    rank = 0
    if multihost:
        rank, nproc = init_multihost(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
            platform=os.environ.get("GPU_BPE_TPU_PLATFORM"),
        )
        args.backend = "dist"
        print(f"multi-host: process {rank}/{nproc}", file=sys.stderr)

    paths = collect_files(args.files)
    total = sum(os.path.getsize(p) for p in paths)
    if rank == 0:
        print(f"corpus: {len(paths)} file(s), {format_size(total)} · vocab target: {args.vocab_size}",
              file=sys.stderr)
    config = TrainConfig(
        vocab_size=args.vocab_size,
        backend=args.backend,
        pre_tokenize=not args.byte_level,
        dedup=not args.no_dedup,
        shuffle=args.shuffle,
        batch_merges=args.batch_merges,
        profile_dir=args.profile,
    )
    t0 = time.perf_counter()
    # streamed ingestion keeps host memory bounded by unique-word mass;
    # automatic above 1 GB, forced with --stream
    if args.stream or (total > (1 << 30) and not config.shuffle
                       and config.pre_tokenize and config.dedup and config.backend != "cpu"):
        tokenizer, result = train_files(paths, config)
    else:
        tokenizer, result = train([open(p, "rb").read() for p in paths], config)
    dt = time.perf_counter() - t0
    if rank == 0:
        print(f"✓ {len(result.merges)} merges, vocab {result.vocab_size}, "
              f"{dt:.1f}s ({len(result.merges) / max(dt, 1e-9):.1f} merges/s)", file=sys.stderr)
        tokenizer.save(args.output)
        print(f"→ {args.output}", file=sys.stderr)
    if multihost:
        shutdown_multihost()  # barrier: rank 0 finishes writing first
    return 0


def cmd_encode(args) -> int:
    tok = load_model(args.model, backend="cpu")
    if args.greedy:
        tokens = tok.encode_bytes_greedy(args.text.encode()).tolist()
    else:
        tokens = tok.encode(args.text)
    print(" ".join(str(t) for t in tokens))
    data = args.text.encode()
    if tokens:
        print(f"# {len(tokens)} tokens · {len(data) / len(tokens):.2f} bytes/token", file=sys.stderr)
    return 0


def cmd_decode(args) -> int:
    tok = load_model(args.model, backend="cpu")
    sys.stdout.write(tok.decode_text([int(t) for t in args.tokens]))
    sys.stdout.write("\n")
    return 0


def cmd_export_bin(args) -> int:
    tok = load_model(args.model, backend=args.backend)
    data = b"\n\n".join(_read_files(args.files))
    t0 = time.perf_counter()
    blob = export_bin(tok, data, args.output)
    dt = time.perf_counter() - t0
    n_tokens = (len(blob) - 16) // 4  # approximation ignoring vocab JSON tail
    rate = len(data) / (1 << 20) / max(dt, 1e-9)
    print(f"→ {args.output}: {format_size(len(blob))} in {dt:.2f}s "
          f"({rate:.2f} MB/s; first runs include one-time compiles — "
          f"see `warmup`)", file=sys.stderr)
    return 0


def cmd_warmup(args) -> int:
    """Precompile the power-of-two shape ladder into the persistent cache.

    The batched merge step costs tens of seconds to compile per capacity;
    running this once makes every later train/tokenize start fast.
    """
    import numpy as np

    from .ops import TPUTrainer, make_stream
    from .ops.ingest import SymbolStream

    rng = np.random.default_rng(0)
    for logcap in range(args.min_log2, args.max_log2 + 1):
        n = (1 << logcap) - 64
        toks = rng.integers(1, 120, size=n).astype(np.uint32)
        ws = rng.random(n) < 0.2
        sym = toks | (ws.astype(np.uint32) << 16)
        sym[0] |= 1 << 16
        stream = SymbolStream(sym, np.ones(n, np.int32), n, n)
        t0 = time.perf_counter()
        TPUTrainer().train_stream(stream, target_vocab_size=256 + 8)
        print(f"  cap 2^{logcap}: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if args.tokenize:
        # precompile the stab-join tokenizer for common vocab-row buckets
        # (stab rows pad to powers of two) and input-size buckets
        from .ops.tokenize import TPUTokenizer

        for rows_log2 in (12, 13, 15):  # ~4K / 8K / 32K-token models
            rng2 = np.random.default_rng(1)
            toks2 = {bytes([b]) for b in range(256)}
            vocab = [bytes([b]) for b in range(256)]
            target = (1 << rows_log2) + 200
            while len(vocab) < target:
                ln = int(rng2.integers(2, 13))
                t = bytes(rng2.integers(97, 122, size=ln).tolist())
                if t not in toks2:
                    toks2.add(t)
                    vocab.append(t)
            tok = TPUTokenizer(vocab)
            for in_log2 in range(args.min_log2, min(args.max_log2, 24) + 1, 2):
                t0 = time.perf_counter()
                tok.encode_bytes(bytes(rng2.integers(97, 122, size=(1 << in_log2) - 5).tolist()))
                print(f"  tokenize rows 2^{rows_log2} in 2^{in_log2}: "
                      f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
    print("✓ ladder compiled (persistent cache)", file=sys.stderr)
    return 0


def cmd_export_trie(args) -> int:
    tok = load_model(args.model, backend="cpu")
    blob = export_trie(tok, args.output)
    from .trie import parse_header

    h = parse_header(blob)
    print(f"→ {args.output}: {h.node_count} nodes, {h.edge_count} edges, "
          f"maxTokenLen={h.max_token_len} ({format_size(len(blob))})", file=sys.stderr)
    return 0


def cmd_export_hf(args) -> int:
    tok = load_model(args.model, backend="cpu")
    text = tok.export_hf_json(pretok=args.pretok)
    with open(args.output, "w", encoding="utf-8") as f:
        f.write(text)
    print(f"→ {args.output}: {tok.vocab_size} tokens, "
          f"{len(tok.model.merges)} merges, pretok={args.pretok}", file=sys.stderr)
    return 0


def cmd_vocab(args) -> int:
    tok = load_model(args.model, backend="cpu")
    sys.stdout.write(tok.export_vocab_text())
    return 0


def cmd_inspect(args) -> int:
    with open(args.file, "rb") as f:
        data = f.read()
    from .core.model_io import read_dxft

    tokens, model, header = read_dxft(data)
    print(f"DXFT v2: vocabSize={header['vocabSize']} tokens={header['tokenCount']}")
    if model:
        print(f"embedded model: {model.vocab_size} tokens, {len(model.merges)} merges")
    print("first tokens:", tokens[:16].tolist())
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gpu_bpe_tpu", description="TPU-native BPE training & tokenization")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a BPE vocabulary")
    t.add_argument("files", nargs="+")
    t.add_argument("-o", "--output", default="model.json")
    t.add_argument("--vocab-size", type=int, default=4096)
    t.add_argument("--backend", choices=["tpu", "dist", "cpu"], default="tpu")
    t.add_argument("--byte-level", action="store_true", help="skip Unicode pre-tokenization")
    t.add_argument("--no-dedup", action="store_true")
    t.add_argument("--shuffle", action="store_true", help="paragraph shuffle at ingest")
    t.add_argument("--batch-merges", type=int, default=BATCH_MERGES)
    t.add_argument("--stream", action="store_true",
                   help="streamed ingestion (bounded host memory; auto above 1 GB)")
    t.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax.profiler trace of training to DIR")
    t.add_argument("--coordinator", metavar="HOST:PORT", default=None,
                   help="multi-host: jax.distributed coordinator address "
                        "(or env GPU_BPE_TPU_COORDINATOR); forces --backend dist")
    t.add_argument("--num-processes", type=int, default=None,
                   help="multi-host: total process count (env GPU_BPE_TPU_NUM_PROCESSES)")
    t.add_argument("--process-id", type=int, default=None,
                   help="multi-host: this process's rank (env GPU_BPE_TPU_PROCESS_ID)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("encode", help="encode text (merge-order semantics)")
    e.add_argument("model")
    e.add_argument("text")
    e.add_argument("--greedy", action="store_true", help="use the bulk greedy path")
    e.set_defaults(fn=cmd_encode)

    d = sub.add_parser("decode", help="decode token ids to text")
    d.add_argument("model")
    d.add_argument("tokens", nargs="+")
    d.set_defaults(fn=cmd_decode)

    b = sub.add_parser("export-bin", help="tokenize files into a .bin (DXFT)")
    b.add_argument("model")
    b.add_argument("files", nargs="+")
    b.add_argument("-o", "--output", default="tokens.bin")
    b.add_argument("--backend", choices=["tpu", "cpu"], default="tpu")
    b.set_defaults(fn=cmd_export_bin)

    tr = sub.add_parser("export-trie", help="compile the v3 binary trie artifact")
    tr.add_argument("model")
    tr.add_argument("-o", "--output", default="model.trie")
    tr.set_defaults(fn=cmd_export_trie)

    hf = sub.add_parser(
        "export-hf", help="export a Hugging Face tokenizer.json (byte-level BPE)"
    )
    hf.add_argument("model")
    hf.add_argument("-o", "--output", default="tokenizer.json")
    hf.add_argument(
        "--pretok", choices=("none", "byte-level"), default="none",
        help="none = exact merge-order semantics over the whole stream; "
             "byte-level = GPT-2 pre-split regex (ecosystem standard)",
    )
    hf.set_defaults(fn=cmd_export_hf)

    v = sub.add_parser("vocab", help="dump vocabulary as text")
    v.add_argument("model")
    v.set_defaults(fn=cmd_vocab)

    i = sub.add_parser("inspect", help="inspect a .bin artifact")
    i.add_argument("file")
    i.set_defaults(fn=cmd_inspect)

    w = sub.add_parser("warmup", help="precompile the shape ladder (one-time)")
    w.add_argument("--min-log2", type=int, default=15)
    w.add_argument("--max-log2", type=int, default=22)
    w.add_argument("--tokenize", action="store_true",
                   help="also precompile the stab-join tokenizer shape buckets")
    w.set_defaults(fn=cmd_warmup)
    return p


def main(argv: list[str] | None = None) -> int:
    import os

    from .utils import enable_compile_cache

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # Honor JAX_PLATFORMS=cpu via jax.config too: some accelerator
        # plugins hook backend resolution and would still initialize (and
        # possibly block on) the device even when the env var selects cpu.
        import jax

        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()  # device compiles are 60-160 s/shape; cache them
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
