"""Execute a BASELINE.json benchmark preset end-to-end and record a
BENCH-style JSON artifact (VERDICT round-1 item 5).

Runs the full pipeline (PID seed + LMPC laps) at the preset's scale on the
current backend, reports laps completed, throughput (scenario-steps/s), and
the TRUE batched-step wall-latency percentiles (one control step for the
whole batch — not the per-scenario amortized figure), and writes
``BENCH_<preset>.json`` at the repo root.

Usage:  python examples/run_config_bench.py config4_lmpc [--out PATH]
Long runs (config5_lmpc_4k is ~1 h on one v5e) belong in tmux, not under
``timeout``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

from racinglmpc_tpu.runtime import presets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preset", choices=sorted(presets.PRESETS))
    ap.add_argument("--out", default=None)
    ap.add_argument("--scale-batch", type=float, default=1.0)
    ap.add_argument("--n-laps", type=int, default=None)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="checkpoint every 2 laps; with --resume, continue a "
                         "wedged run instead of restarting")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    out = presets.run_preset(
        args.preset, scale_batch=args.scale_batch, n_laps=args.n_laps,
        verbose=True, checkpoint_dir=args.checkpoint_dir, resume=args.resume,
    )
    import jax

    out["device"] = str(jax.devices()[0].platform)
    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCH_{args.preset}.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
