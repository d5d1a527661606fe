import os, time, resource
import bench
# write a ~1GB corpus to disk in 64MB pieces (distinct seeds -> distinct text)
path = "/tmp/big_corpus.txt"
if not os.path.exists(path) or os.path.getsize(path) < (1 << 30):
    with open(path, "wb") as f:
        for seed in range(16):
            f.write(bench.synth_corpus(64 << 20, seed=seed))
    print("corpus written:", os.path.getsize(path) >> 20, "MB", flush=True)

from gpu_bpe_tpu.api import TrainConfig, train_files
t0 = time.time()
cfg = TrainConfig(vocab_size=8192, show_progress=False)
tok, res = train_files([path], cfg)
dt = time.time() - t0
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(f"1GB streamed: {len(res.merges)} merges in {dt:.0f}s total "
      f"({len(res.merges)/res.training_time_s:.0f}/s train), peak RSS {rss:.1f} GB", flush=True)
tok.save("/tmp/model_1gb.json")
ids = tok.encode_bytes_greedy(open(path, "rb").read(1 << 20))
dec = tok.decode(ids)
assert bytes(dec) == open(path, "rb").read(1 << 20)
print("round trip on 1MB slice OK;", f"{(1<<20)/len(ids):.2f} bytes/token", flush=True)
