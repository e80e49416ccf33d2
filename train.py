"""Training entry point (reference train.py:12-36).

Usage: python train.py -cn exp_kitti_raw [key.subkey=value ...]
"""
from __future__ import annotations

import argparse
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

    from behindthescenes_tpu.platform import maybe_init_distributed
    proc_idx, proc_cnt = maybe_init_distributed(config)
    if proc_cnt > 1:
        print(f"multi-host: process {proc_idx}/{proc_cnt}")
        # Per-host data variety comes from disjoint dataset shards
        # (loader.shard_for_host), NOT from forking the seed: the compiled
        # step is SPMD, so every traced input the hosts pass as
        # "replicated" (PRNG key, view ids) must be host-invariant —
        # rank-seeding those would silently diverge the global program.
        config["data"] = dict(config.get("data", {}),
                              host_shard=(proc_idx, proc_cnt))

    model = config.get("model", "bts")
    if model == "bts":
        from behindthescenes_tpu.training.tasks import bts_training
        training = bts_training
    elif model == "bts_overfit":
        from behindthescenes_tpu.training.tasks import bts_overfit_training
        training = bts_overfit_training
    else:
        raise ValueError(f"Unknown model/task: {model}")

    training(config)


if __name__ == "__main__":
    sys.exit(main())
