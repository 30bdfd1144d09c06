#!/bin/bash
# Round-5 TPU session, part 2: fused-solver ablations (after the
# component-major Mosaic rewrite), HER capability sweep, pixel training
# artifact.  Same stage protocol as r5_tpu_session.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p devtools/r5_logs
L=devtools/r5_logs

stage() {  # stage <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ -s "$L/$name.done" ]; then echo "[skip] $name"; return 0; fi
  echo "[run ] $name: $*"
  if timeout "$t" "$@" > "$L/$name.log" 2>&1; then
    echo ok > "$L/$name.done"; echo "[done] $name"
  else
    echo "[FAIL] $name (rc=$?) — see $L/$name.log"
  fi
}

# 1. fused-solver ablations (rewritten kernel)
stage bench_k16_pallas_solve 2400 env BENCH_MAX_CONTACTS=16 GST_PALLAS_SOLVE=1 python bench.py
stage bench_k16_both 2400 env BENCH_MAX_CONTACTS=16 GST_PALLAS_SOLVE=1 GST_PALLAS_HULL=1 python bench.py
stage bench_k32_pallas_solve 2400 env BENCH_MAX_CONTACTS=32 GST_PALLAS_SOLVE=1 python bench.py

# 2. fused-solver on-chip quality validation
stage solver_quality 2400 python devtools/probe_solver_quality_r5.py

# 3. HER capability sweep: short runs over the update-ratio / goal levers.
#    (r4 pathology: utd 1-2 at 256 envs is a 128-256x lower update:data
#    ratio than the SB3 reference's 1 update per env step.)
stage her_sweep_utd16 2400 python scripts/train_sac_her.py \
  --num-envs 256 --total-steps 600000 --near-cube-only --utd 16 \
  --goal-min-dist 0.02 --seed 1
stage her_sweep_utd64 2400 python scripts/train_sac_her.py \
  --num-envs 256 --total-steps 600000 --near-cube-only --utd 64 \
  --her-episodes 1024 --goal-min-dist 0.02 --seed 1
stage her_random_baseline 2400 python scripts/train_sac_her.py \
  --num-envs 256 --total-steps 300000 --near-cube-only \
  --learning-starts 1000000000 --goal-min-dist 0.02 --seed 1

# 4. pixel-SAC learning artifact (the reference's default obs family at the
#    example.py training resolution 64x48)
stage train_sac_pixels 14400 python scripts/train_sac.py \
  --task so100_touch_cube --obs pixels_agent_pos --obs-height 48 --obs-width 64 \
  --num-envs 128 --total-steps 400000 \
  --checkpoint-dir devtools/r5_ckpt_pix --checkpoint-every 200000

echo "session2 complete; logs in $L/"
