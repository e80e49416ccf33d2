"""Serving-profile PSNR/SSIM sweep: run the NVS eval CLI across sampling
profiles (flat coarse vs importance fine, with/without fine_reuse_coarse)
and print one table. Used for the PERF.md serving sweeps — in particular
the thin-structure family, where flat coarse sampling blurs sub-z-bin
poles and the importance pass should win at equal query budget.

Usage:
  python scripts/sweep_serving_profiles.py eval_synthetic_thin_nvs \
      checkpoint=out/synthetic_thin/best \
      [--profiles 32,0,0 16,16,1 16,0,0 8,8,1]

Each profile is n_coarse,n_fine,reuse(0|1); queried pts/ray =
n_coarse + n_fine (reuse) or n_coarse + (n_coarse + n_fine) (re-query,
the reference's fine semantics — nerf.py:230-238).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_profile(config, overrides, nc, nf, reuse):
    cmd = [sys.executable, os.path.join(REPO, "eval.py"), "-cn", config,
           *overrides,
           f"renderer.n_coarse={nc}", f"renderer.n_fine={nf}",
           f"renderer.fine_reuse_coarse={'true' if reuse else 'false'}"]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         timeout=3600)
    if out.returncode != 0:
        raise RuntimeError(f"profile {nc}+{nf} failed:\n{out.stdout[-2000:]}"
                           f"\n{out.stderr[-2000:]}")
    # eval.py prints the final metrics as one JSON line (last line).
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON metrics in output:\n{out.stdout[-2000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("overrides", nargs="*")
    ap.add_argument("--profiles", nargs="+",
                    default=["32,0,0", "16,16,1", "16,0,0", "8,8,1"])
    args = ap.parse_args()

    rows = []
    for prof in args.profiles:
        nc, nf, reuse = (int(x) for x in prof.split(","))
        qpts = nc + nf if (reuse or nf == 0) else nc + (nc + nf)
        m = run_profile(args.config, args.overrides, nc, nf, reuse)
        rows.append((nc, nf, bool(reuse), qpts, m))
        print(f"{nc:3d}+{nf:<3d} reuse={int(reuse)} qpts/ray={qpts:3d}  "
              f"psnr={m.get('psnr', float('nan')):.3f}  "
              f"ssim={m.get('ssim', float('nan')):.4f}", flush=True)

    print(json.dumps([{"n_coarse": nc, "n_fine": nf, "reuse": r,
                       "qpts_per_ray": q, **m}
                      for nc, nf, r, q, m in rows]))


if __name__ == "__main__":
    main()
