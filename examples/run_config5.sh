#!/bin/bash
# BASELINE config 5 at the single-chip scope, restartable across TPU-tunnel
# wedges: checkpoints land every 2 laps (presets.run_preset) and each retry
# resumes from the last checkpoint instead of restarting the run.
#
# Scale note (round 5): bare control steps fit at 2048
# (BENCH_memory_probe.json) but the FULL pipeline (lap archives, collect,
# checkpoints) OOMs at 2048 and 1920 in run_lap_chunked - 1792 remains the
# full-pipeline single-chip scale. 4096 needs the >=2-host mesh.
# Usage: bash examples/run_config5.sh [ckpt_dir] [out_json] [scale]
set -u
CKPT="${1:-/root/repo/.ckpt_config5}"
OUT="${2:-/root/repo/BENCH_config5_lmpc_4k.json}"
SCALE="${3:-0.4375}"
cd /root/repo
for i in $(seq 1 12); do
  echo "[config5] attempt $i $(date)" >&2
  timeout 5400 python -c "
from racinglmpc_tpu.runtime import presets
import json
out = presets.run_preset('config5_lmpc_4k', scale_batch=${SCALE},
                         checkpoint_dir='${CKPT}', resume=True,
                         verbose=True)
out['scope_note'] = ('single-chip scale: batch 1792 = largest running the '
                     'FULL pipeline on one v5e (bare steps fit 2048 - '
                     'BENCH_memory_probe.json; 2048/1920 OOM in the lap '
                     'loop); 4096 needs the >=2-host mesh')
with open('${OUT}', 'w') as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
" && exit 0
  echo "[config5] attempt $i failed (rc=$?); waiting out a possible tunnel wedge" >&2
  sleep 600
done
echo "[config5] exhausted retries" >&2
exit 1
