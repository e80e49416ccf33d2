"""Export a converged orbax checkpoint's {params, batch_stats} to a
compressed f16 npz (utils/io.save_params_npz layout) so accuracy-gate
tests can load it without orbax or the training topology.

Usage:
  JAX_PLATFORMS=cpu python scripts/export_weights.py \
      out/kitti_360/best media/weights/k360_synth_conv.npz [--step N]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir", help="orbax checkpoint dir (…/best or "
                                     "…/checkpoints)")
    ap.add_argument("out_npz")
    ap.add_argument("--step", type=int, default=None)
    args = ap.parse_args()

    from behindthescenes_tpu.training.harness import CheckpointManager
    from behindthescenes_tpu.utils.io import save_params_npz

    mgr = CheckpointManager(args.ckpt_dir)
    step = args.step if args.step is not None else mgr.latest_step()
    restored = mgr.restore_replicated(step)
    variables = {"params": restored["params"],
                 "batch_stats": restored.get("batch_stats", {})}
    save_params_npz(args.out_npz, variables)
    size = os.path.getsize(args.out_npz) / 1e6
    print(f"exported step {step} -> {args.out_npz} ({size:.1f} MB)")


if __name__ == "__main__":
    main()
