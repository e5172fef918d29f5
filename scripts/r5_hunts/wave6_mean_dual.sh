#!/bin/bash
# r5 wave 6: a higher-mean dual-table candidate. The shipped dual (22307)
# runs mean 0.832; the near-duals (22103/22000) run 0.85 but drop 1e-4 of
# stage_1. Attacks: widen the pp10pa10 pool (the only recipe with a clean
# 10k/10k stage_1 at full AAPE coverage), and PP10-polish the 0.852
# near-dual itself.
set -u
cd /root/repo

run_arm() {
  local name="$1"; shift
  local seeds_base="$1"; shift
  local n="$1"; shift
  local init="$1"; shift
  local seeds=$(seq $seeds_base $((seeds_base + n - 1)))
  echo "=== ARM $name ($(date)) init: $init extra: $*"
  python -u scripts/sweep.py --out results/r5_$name --seeds $seeds \
    --vmap 8 --shuffle timeperm --total-timesteps 12000000 \
    --snapshot-steps 3000000 6000000 9000000 \
    --init-params "$init" \
    --env rew_collision=-70 --env abs_inv_CA_min_rew=1/6 \
    --env curriculum_scale=0.05 --env obstacle_radius_max=160 \
    --env stage_mix_prob=0.3 --env stage_mix_weights=3,1,1,1,1 \
    --env adaptive_rehearsal=True --env rehearsal_adapt=False \
    --ppo hidden_sizes=128,128 "$@" \
    > logs/r5/arm_$name.log 2>&1 || { echo "ARM $name TRAIN FAILED"; return 1; }
  python -u scripts/select_agents.py results/r5_$name/seed_* \
    --episodes 100 --seed 0 --out results/r5_$name/select.json \
    >> logs/r5/arm_$name.log 2>&1
  python -u scripts/select_agents.py results/r5_$name/seed_* \
    --episodes 100 --seed 777 --out results/r5_$name/select777.json \
    >> logs/r5/arm_$name.log 2>&1
  echo "=== ARM $name done ($(date))"
}

run_arm pp10pa10b 22700 24 artifacts/agent_s8004/new_agent.npz \
  --env PP_rew_max=10 --env PA_scale=10 --env PA_band_edge=150
run_arm pp10gen2 22900 8 results/r5_pa10gen2/seed_22103/ckpt_3014656.npz \
  --env PP_rew_max=10 --env PA_scale=10 --env PA_band_edge=150
echo "=== DOSE6 COMPLETE ($(date))"
