import logging, time
logging.basicConfig(level=logging.DEBUG, format="%(message)s")
logging.getLogger("jax").setLevel(logging.WARNING)
import bench, numpy as np, jax.numpy as jnp
from gpu_bpe_tpu.ops import TPUTrainer, make_stream
from gpu_bpe_tpu.ops.ingest import pad_stream
from gpu_bpe_tpu.ops.train_step import init_state, train_batch_jit
from gpu_bpe_tpu.pretok import PreTokenizer

corpus = bench.synth_corpus(16 << 20)
data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
stream = make_stream(data, starts, dedup=True)
# fixed capacity (no shrink): isolate per-iteration cost at CAP=1M
padded = pad_stream(stream)
state = init_state(jnp.asarray(padded.symbols), jnp.asarray(padded.weights), stream.n, 256)
state = train_batch_jit(state, jnp.asarray(128, jnp.int32))  # warm + advance
for batch in (128, 256, 256):
    t0 = time.perf_counter()
    state = train_batch_jit(state, jnp.asarray(batch, jnp.int32))
    d = int(state.duals); r = int(state.recounts)
    dt = time.perf_counter() - t0
    md = int(state.merges_done)
    iters = md - d
    print(f"batch {md} merges: {dt*1e3:.1f} ms -> {dt/md*1e6:.0f} us/merge, "
          f"{iters} iters -> {dt/iters*1e6:.0f} us/iter (duals {d}, recounts {r})")
