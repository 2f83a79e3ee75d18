"""A/B a single bench metric under current env (used for kernel A/Bs).

Usage: VIDEOMAMBA_MIXER_PIPELINE=0 python scripts/ab_train.py [train|stream|tiny]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402
from videomamba_tpu.models.presets import videomamba_base, videomamba_tiny  # noqa: E402

which = sys.argv[1] if len(sys.argv) > 1 else "train"
if which == "train":
    out = bench.bench_train_step(videomamba_base, "base_train", 8, 4, quick=False)
elif which == "stream":
    out = bench.bench_streaming(videomamba_base, "base_stream", 64, 1, "bf16", False)
elif which == "tiny":
    out = bench.bench_streaming(videomamba_tiny, "tiny_stream", 16, 1, "bf16", False)
else:
    raise SystemExit(f"unknown target {which}")
print(json.dumps({k: round(v, 4) for k, v in out.items()}))
