import time, numpy as np
import bench
from gpu_bpe_tpu.ops import TPUTrainer
from gpu_bpe_tpu.ops.tokenize import TPUTokenizer
from gpu_bpe_tpu.pretok import PreTokenizer

corpus = bench.synth_corpus(16 << 20)
data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
t0 = time.time()
res = TPUTrainer().train(data, starts, target_vocab_size=8192)
print(f"trained 8K vocab in {time.time()-t0:.0f}s", flush=True)
from collections import Counter
lens = Counter(len(v) for v in res.vocab)
print("len dist >8:", {k: v for k, v in sorted(lens.items()) if k > 8}, flush=True)
tok = TPUTokenizer(res.vocab)
print("stab:", tok.tables.stab is not None,
      "long rows:", tok.tables.stab.get("long_count", 0) if tok.tables.stab else 0,
      "dense:", tok.tables.dense_lengths, flush=True)
t0 = time.time(); _ = tok.encode_bytes(corpus[:1 << 20])
print(f"compile+1MB: {time.time()-t0:.0f}s", flush=True)
t0 = time.time(); ids = tok.encode_bytes(corpus[:8 << 20])
dt = time.time() - t0
print(f"8MB: {dt:.2f}s -> {8/dt:.1f} MB/s wall, {(8<<20)/len(ids):.2f} bytes/token", flush=True)

t0 = time.time(); ids2 = tok.encode_bytes(corpus[:8 << 20])
dt2 = time.time() - t0
print(f"8MB warm: {dt2:.2f}s -> {8/dt2:.1f} MB/s wall", flush=True)
