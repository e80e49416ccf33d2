"""Evaluation entry point (reference eval.py:8-38).

Usage: python eval.py -cn eval_depth [key=value ...]
Registry: bts (depth), bts_nvs, bts_lidar (KITTI-360 occupancy),
bts_3dbb (3D bbox occupancy).
"""
from __future__ import annotations

import argparse
import json
import sys

from behindthescenes_tpu.platform import apply_platform_env

apply_platform_env()

from behindthescenes_tpu.config import (find_config, load_config,
                                        parse_cli_overrides)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-cn", "--config-name", required=True)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()

    config = load_config(find_config(args.config_name),
                         parse_cli_overrides(args.overrides))

    model = config.get("model", "bts")
    if model == "bts":
        from behindthescenes_tpu.evaluation.tasks import evaluate_depth
        metrics = evaluate_depth(config)
    elif model == "bts_nvs":
        from behindthescenes_tpu.evaluation.tasks import evaluate_nvs
        metrics = evaluate_nvs(config)
    elif model == "bts_lidar":
        from behindthescenes_tpu.evaluation.tasks import evaluate_lidar_occ
        metrics = evaluate_lidar_occ(config)
    elif model == "bts_3dbb":
        from behindthescenes_tpu.evaluation.tasks import evaluate_3dbb
        metrics = evaluate_3dbb(config)
    else:
        raise ValueError(f"Unknown eval task: {model}")
    # Machine-readable result on stdout; exit 0 on success (returning the
    # dict through sys.exit would report failure to the shell).
    print(json.dumps({k: float(v) for k, v in metrics.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
