import jax, time, numpy as np, jax.numpy as jnp
import bench
from gpu_bpe_tpu.ops import make_stream
from gpu_bpe_tpu.ops.ingest import pad_stream
from gpu_bpe_tpu.ops.train_step import init_state, train_batch_jit
from gpu_bpe_tpu.pretok import PreTokenizer

corpus = bench.synth_corpus(16 << 20)
data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
stream = make_stream(data, starts, dedup=True)
padded = pad_stream(stream)
state = init_state(jnp.asarray(padded.symbols), jnp.asarray(padded.weights), stream.n, 256)
state = train_batch_jit(state, jnp.asarray(128, jnp.int32))
_ = int(state.n)  # sync
with jax.profiler.trace("/tmp/bpe_trace"):
    state = train_batch_jit(state, jnp.asarray(256, jnp.int32))
    _ = int(state.n)
print("trace captured")
