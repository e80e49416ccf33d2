#!/bin/bash
# Fast->flat annealed training recipe (PERF.md round 5).
#
# The fast sampling profile (24 coarse + 16 importance fine with
# `fine_reuse_coarse`, 40 queried pts/ray) trains ~1.39x faster than the
# reference 64-flat budget and matches it on NVS, but softens metric depth
# on low-depth-complexity scenes (PERF.md round 4); around-depth fine
# samples CANNOT fix this from scratch (measured collapse, PERF.md round
# 5). The working recipe is to anneal the SAMPLER: train the bulk of the
# run at the fast profile, then fine-tune under the 64-flat
# depth-benchmark sampler so the learned density re-sharpens at the
# sampling rate the depth eval uses.
#
# Usage: scripts/train_fastanneal.sh <out_dir> [fast_iters] [flat_iters]
# Defaults reproduce the round-5 run: 15k fast + 2k flat @1e-4 + 1k flat
# @2e-5 (measured: val abs_rel 0.19-class fast plateau -> 0.16-class).
set -eu
cd "$(dirname "$0")/.."
OUT=${1:?out dir}
FAST=${2:-15000}
FLAT=${3:-3000}
FINE=$((FLAT / 3))
T1=$((FAST + FLAT - FINE))
T2=$((FAST + FLAT))

scripts/train_segmented.sh exp_synthetic_flagship_fast "$OUT" "$FAST" 2000 \
    transfer_dtype=bfloat16 output_path="$OUT"
scripts/train_segmented.sh exp_synthetic_flagship "$OUT" "$T1" 1000 \
    transfer_dtype=bfloat16 output_path="$OUT" name=fastanneal
scripts/train_segmented.sh exp_synthetic_flagship "$OUT" "$T2" 1000 \
    transfer_dtype=bfloat16 output_path="$OUT" name=fastanneal \
    learning_rate=2.0e-5
