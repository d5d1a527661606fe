import time, json
import bench
from gpu_bpe_tpu.ops import TPUTrainer, make_stream
from gpu_bpe_tpu.pretok import PreTokenizer

for MB, MERGES in ((64, 8192), (256, 32512)):
    corpus = bench.synth_corpus(MB << 20)
    t0 = time.time()
    data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
    stream = make_stream(data, starts, dedup=True)
    ing = time.time() - t0
    t0 = time.time()
    res = TPUTrainer().train_stream(stream, target_vocab_size=256 + MERGES)
    dt = time.time() - t0
    print(f"{MB}MB: ingest {ing:.0f}s ({MB/ing:.0f} MB/s), {len(res.merges)} merges "
          f"in {dt:.0f}s ({len(res.merges)/dt:.0f}/s), n={stream.n}", flush=True)
