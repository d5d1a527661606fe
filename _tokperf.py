import time, numpy as np
import bench
from gpu_bpe_tpu.ops.tokenize import TPUTokenizer

# synthetic 33K vocab with realistic length mix incl. 9-16 byte tokens
rng = np.random.default_rng(3)
toks = {bytes([b]) for b in range(256)}
vocab = [bytes([b]) for b in range(256)]
while len(vocab) < 33000:
    ln = int(rng.integers(2, 17))
    t = bytes(rng.integers(97, 117, size=ln).tolist())
    if t not in toks:
        toks.add(t); vocab.append(t)
n_long = sum(1 for v in vocab if len(v) > 8)
print(f"vocab 33K, {n_long} tokens >8 bytes", flush=True)
tok = TPUTokenizer(vocab)
print("stab:", tok.tables.stab is not None, "long rows:", tok.tables.stab.get("long_count", 0),
      "dense lengths:", tok.tables.dense_lengths, flush=True)
data = bench.synth_corpus(8 << 20)
t0 = time.time(); ids = tok.encode_bytes(data[:1 << 20]); print(f"compile+first 1MB: {time.time()-t0:.0f}s", flush=True)
t0 = time.time(); ids = tok.encode_bytes(data)
dt = time.time() - t0
print(f"8MB: {dt:.2f}s -> {8/dt:.1f} MB/s wall ({len(ids)} tokens)", flush=True)
