#!/bin/bash
# Poll for TPU availability, then run the round's TPU-blocked queue.
# Logs to /tmp/tpu_queue.log; writes /tmp/tpu_queue.done when finished.
set -u
cd /root/repo
LOG=/tmp/tpu_queue.log
echo "=== tpu_queue_runner start $(date -u +%H:%M:%SZ) ===" >> "$LOG"

while true; do
  if timeout 180 python -c "import jax; jax.devices()" >> "$LOG" 2>&1; then
    echo "=== TPU up at $(date -u +%H:%M:%SZ) ===" >> "$LOG"
    break
  fi
  echo "probe failed $(date -u +%H:%M:%SZ); sleeping 300s" >> "$LOG"
  sleep 300
done

echo "--- 1/5 bench sanity ---" >> "$LOG"
timeout 3600 python bench.py >> "$LOG" 2>&1
echo "bench rc=$?" >> "$LOG"

echo "--- 2/5 certificate validation @HEAD ---" >> "$LOG"
timeout 7200 python scripts/validate_certificate.py --mb 64 --merges 8192 >> "$LOG" 2>&1
echo "validate_certificate rc=$?" >> "$LOG"

echo "--- 3/5 tokenize rates ---" >> "$LOG"
timeout 7200 python scripts/bench_tokenize_vocabs.py \
  --out docs/artifacts/tokenize_rates.json >> "$LOG" 2>&1
echo "bench_tokenize_vocabs rc=$?" >> "$LOG"

echo "--- 4/5 train phase profile ---" >> "$LOG"
timeout 7200 python scripts/profile_train.py --mb 16 --merges 2048 --depth 1024 \
  --out docs/artifacts/train_phases.json >> "$LOG" 2>&1
echo "profile_train rc=$?" >> "$LOG"

echo "--- 5/5 10 GB streamed train ---" >> "$LOG"
timeout 21600 python scripts/validate_stream.py --gb 10 \
  --out docs/artifacts/stream_10gb.json >> "$LOG" 2>&1
echo "validate_stream rc=$?" >> "$LOG"

echo "=== queue complete $(date -u +%H:%M:%SZ) ===" >> "$LOG"
touch /tmp/tpu_queue.done

# commit the artifacts so TPU results survive even if the session is idle
cd /root/repo
git add docs/artifacts/certificate_validation.json \
        docs/artifacts/tokenize_rates.json \
        docs/artifacts/train_phases.json \
        docs/artifacts/stream_10gb.json 2>> "$LOG"
if ! git diff --cached --quiet; then
  git commit -m "TPU queue artifacts: certificate validation, tokenize rates, train phases, 10GB stream" >> "$LOG" 2>&1
fi
