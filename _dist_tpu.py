# 1-device TPU mesh: dist pallas branch vs single-chip merge list
import time
import bench
from gpu_bpe_tpu.ops import TPUTrainer
from gpu_bpe_tpu.parallel import DistributedTrainer
from gpu_bpe_tpu.pretok import PreTokenizer

corpus = bench.synth_corpus(1 << 20)
data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
t0 = time.time()
r1 = TPUTrainer().train(data, starts, target_vocab_size=256 + 256)
print("single:", len(r1.merges), f"{time.time()-t0:.0f}s", flush=True)
t0 = time.time()
r2 = DistributedTrainer().train(data, starts, target_vocab_size=256 + 256)
print("dist(1):", len(r2.merges), f"{time.time()-t0:.0f}s", flush=True)
assert r1.merges == r2.merges and r1.merge_counts == r2.merge_counts
print("dist pallas branch == single-chip merge list (bitwise)")
