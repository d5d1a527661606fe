import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
import bench
from gpu_bpe_tpu.ops import make_stream
from gpu_bpe_tpu.ops.ingest import pad_stream
from gpu_bpe_tpu.ops.pallas_kernels import merge_compact_tracked
from gpu_bpe_tpu.ops.train_step import find_best_pair
from gpu_bpe_tpu.pretok import PreTokenizer

corpus = bench.synth_corpus(16 << 20)
data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
stream = make_stream(data, starts, dedup=True)
padded = pad_stream(stream)
symj = jnp.asarray(padded.symbols); wj = jnp.asarray(padded.weights)
nj = jnp.asarray(stream.n, jnp.int32)
bp, bc = find_best_pair(symj, wj, nj)
print("first merge pair count:", int(bc))

@jax.jit
def k_loop(k, s, wt, n, pair):
    def body(i, carry):
        s2, acc = carry
        sym3, w3, n3, bl, br, samp = merge_compact_tracked(s, wt, n, pair, jnp.uint32(300))
        return s2, acc ^ n3
    _, acc = lax.fori_loop(0, k, body, (s, jnp.uint32(0).astype(jnp.int32)))
    return acc

def timeit(fn, iters, *args):
    _ = np.asarray(fn(2, *args))
    t0 = time.perf_counter(); _ = np.asarray(fn(2, *args)); base = time.perf_counter()-t0
    t0 = time.perf_counter(); _ = np.asarray(fn(iters, *args)); full = time.perf_counter()-t0
    return (full-base)/(iters-2)*1e6

# heavy first merge applied repeatedly to the ORIGINAL stream (same heavy work each time)
print(f"merge_compact_tracked heavy ({int(bc)} count): {timeit(k_loop, 50, symj, wj, nj, bp):.0f} us")
# no-op merge (pair absent)
print(f"merge_compact_tracked no-op: {timeit(k_loop, 50, symj, wj, nj, jnp.uint32(0xFFF0FFF1)):.0f} us")
