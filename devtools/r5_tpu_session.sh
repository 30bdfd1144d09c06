#!/bin/bash
# Round-5 TPU session: run everything that needs the real chip, in value
# order, logging to devtools/r5_logs/.  Safe to re-run; each stage skips
# if its output already exists.  Usage:  bash devtools/r5_tpu_session.sh
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

# 0. chip sanity
stage chip_sanity 300 python -c "import jax; print(jax.devices())"

# 1. flagship bench at current defaults (K=16, scan solver, pallas hull)
stage bench_k16_hull1 2400 env BENCH_MAX_CONTACTS=16 python bench.py

# 2. kernel ablation matrix (20-step bench each)
stage bench_k16_pallas_solve 2400 env BENCH_MAX_CONTACTS=16 GST_PALLAS_SOLVE=1 python bench.py
stage bench_k16_nopallas_hull 2400 env BENCH_MAX_CONTACTS=16 GST_PALLAS_HULL=0 python bench.py
stage bench_k16_both 2400 env BENCH_MAX_CONTACTS=16 GST_PALLAS_SOLVE=1 GST_PALLAS_HULL=1 python bench.py

# 3. K=32 numbers (the trained-policy-safe configuration)
stage bench_k32 2400 env BENCH_MAX_CONTACTS=32 python bench.py
stage bench_k32_pallas_solve 2400 env BENCH_MAX_CONTACTS=32 GST_PALLAS_SOLVE=1 python bench.py

# 4. pixels-path bench (the reference's default obs family)
stage bench_pixels 3600 env BENCH_PIXELS=1 BENCH_NUM_ENVS=1024 python bench.py

# 5. fused-solver on-chip quality validation (vs scan path at B=4096)
stage solver_quality 2400 python devtools/probe_solver_quality_r5.py

# 6. trained-policy contact harvest (scripted press until a ckpt exists)
stage k_requal_scripted 3600 python devtools/probe_k_requal_r5.py --scripted

# 7. fidelity knobs on the hard states
stage fidelity 3600 python devtools/probe_fidelity_r5.py

# 8. SAC TouchCube training at K=32 (flagship learning artifact, ~1.5M steps)
stage train_sac_k32 28800 python scripts/train_sac.py \
  --task so100_touch_cube --num-envs 256 --total-steps 1500000 \
  --checkpoint-dir devtools/r5_ckpt_sac --checkpoint-every 250000

# 9. HER near-cube capability run
stage train_her_nearcube 21600 python scripts/train_sac_her.py \
  --num-envs 256 --total-steps 3000000 --near-cube-only \
  --utd 2 --checkpoint-dir devtools/r5_ckpt_her

echo "session complete; logs in $L/"
