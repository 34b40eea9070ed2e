#!/bin/bash
# BASELINE config 5 at the committed single-chip half-scale scope
# (batch 2048, 30 LMPC laps), restartable across TPU-tunnel wedges:
# checkpoints land every 2 laps (presets.run_preset) and each retry
# resumes from the last checkpoint instead of restarting the run.
# Usage: bash examples/run_config5.sh [ckpt_dir] [out_json]
set -u
CKPT="${1:-/root/repo/.ckpt_config5}"
OUT="${2:-/root/repo/BENCH_config5_lmpc_4k.json}"
cd /root/repo
for i in $(seq 1 10); do
  echo "[config5] attempt $i" >&2
  timeout 5400 python -c "
from racinglmpc_tpu.runtime import presets
import json
out = presets.run_preset('config5_lmpc_4k', scale_batch=0.5,
                         checkpoint_dir='${CKPT}', resume=True,
                         verbose=True)
with open('${OUT}', 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
" && exit 0
  echo "[config5] attempt $i failed (rc=$?); waiting out a possible tunnel wedge" >&2
  sleep 600
done
echo "[config5] exhausted retries" >&2
exit 1
