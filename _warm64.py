import time
import bench
from gpu_bpe_tpu.ops import TPUTrainer, make_stream
from gpu_bpe_tpu.pretok import PreTokenizer
corpus = bench.synth_corpus(64 << 20)
t0 = time.time(); data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
t1 = time.time(); stream = make_stream(data, starts, dedup=True)
t2 = time.time()
print(f"pretok {64/(t1-t0):.0f} MB/s, dedup {t2-t1:.0f}s", flush=True)
for trial in range(2):
    t0 = time.time()
    res = TPUTrainer().train_stream(stream, target_vocab_size=256 + 8192)
    dt = time.time() - t0
    print(f"trial {trial}: 8192 merges in {dt:.0f}s ({8192/dt:.0f}/s)", flush=True)
