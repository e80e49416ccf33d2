#!/bin/bash
# Segmented training driver for the axon-relay environment.
#
# The relay client leaks ~30 MB of host RSS per training step (the
# transferred batch bytes; the CPU backend is leak-free — see CLAUDE.md),
# so long runs get OOM-killed. This driver runs training in bounded
# segments that exit cleanly at stop_iteration and auto-resume from the
# orbax checkpoint dir. Each segment is gated on a tiny-op probe so a
# trainer never starts while the remote chip session is wedged (killed
# TPU processes wedge the session for ~5-10 min; a process that attempts
# device init during the wedge can block forever).
#
# Usage: scripts/train_segmented.sh <config> <output_path> <target_iter> \
#          [segment_steps] [extra overrides...]
# e.g.:  scripts/train_segmented.sh exp_synthetic_flagship \
#          out/synthetic_flagship 17000 2200 transfer_dtype=bfloat16
set -u
cd "$(dirname "$0")/.."
CONFIG=$1; OUT=$2; TARGET=$3; SEG=${4:-2200}; shift $(( $# > 4 ? 4 : $# ))
EXTRA=("$@")

# Persistent compile cache: each segment is a fresh process, and big train
# steps (e.g. the fine_reuse profile) can take many minutes to compile
# through the relay — cache so only the first segment pays.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_tpu_cache}

while true; do
  latest=$(ls "$OUT/checkpoints" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1)
  latest=${latest:-0}
  if [ "$latest" -ge "$TARGET" ]; then
    echo "segmented: done at $latest @ $(date)"; break
  fi
  echo "segmented: probing chip @ $(date)"
  if ! timeout 600 python -c \
      "import jax, jax.numpy as j; print(float((j.ones((4,4))@j.ones((4,4)))[0,0]))" \
      >/dev/null 2>&1; then
    echo "segmented: probe failed/wedged, retry in 60s"; sleep 60; continue
  fi
  stop=$((latest + SEG)); [ "$stop" -gt "$TARGET" ] && stop=$TARGET
  echo "segmented: segment $latest -> $stop @ $(date)"
  timeout 2700 python train.py -cn "$CONFIG" num_epochs=1000000 \
    stop_iteration="$stop" "${EXTRA[@]}"
  echo "segmented: segment rc=$? @ $(date)"
  sleep 45   # let the remote session close before reconnecting
done
