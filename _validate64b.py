"""Scenario runner: trains 64MB/8192 and dumps the merge list to a file.
Set GPU_BPE_TPU_FORCE_RECOUNT=1 for the ground-truth variant."""
import json, sys, time
import bench
from gpu_bpe_tpu.ops import TPUTrainer, make_stream
from gpu_bpe_tpu.pretok import PreTokenizer

MB = 64; MERGES = 8192
corpus = bench.synth_corpus(MB << 20)
data, starts = PreTokenizer().pre_tokenize_bytes(corpus)
stream = make_stream(data, starts, dedup=True)
t0 = time.time()
res = TPUTrainer().train_stream(stream, target_vocab_size=256 + MERGES)
dt = time.time() - t0
print(f"{len(res.merges)} merges in {dt:.0f}s ({len(res.merges)/dt:.0f}/s)", flush=True)
json.dump({"merges": res.merges, "counts": res.merge_counts}, open(sys.argv[1], "w"))
