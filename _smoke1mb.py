import time
import bench
from gpu_bpe_tpu.ops import TPUTrainer
from gpu_bpe_tpu.pretok import PreTokenizer
from gpu_bpe_tpu.core import ReferenceTrainer, bytes_to_symbols, tag_word_boundaries
corpus = bench.synth_corpus(1 << 20)
data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
t0=time.time()
res = TPUTrainer().train(data, starts, target_vocab_size=256+512)
print("tpu merges:", len(res.merges), f"{time.time()-t0:.1f}s", flush=True)
sym = tag_word_boundaries(bytes_to_symbols(data), starts)
ref = ReferenceTrainer().train(sym, target_vocab_size=256+512)
assert res.merges == ref.merges and res.merge_counts == ref.merge_counts
print("EXACT vs oracle", flush=True)
