#!/bin/bash
# r5 dose-response wave 2: chase the last AAPE gap (stage_5 ~36 vs 35).
# - widen the pa75band150 pool (best arm: both-RNG 12/11, only stage_5 over)
# - one notch stronger adherence (pa10band150)
# Runs after dose.sh completes; strictly sequential on the TPU.
set -u
cd /root/repo

until grep -q "DOSE-RESPONSE COMPLETE" logs/r5/dose_driver.log; do sleep 30; done

run_arm() {
  local name="$1"; shift
  local seeds_base="$1"; shift
  local n="$1"; shift
  local seeds=$(seq $seeds_base $((seeds_base + n - 1)))
  echo "=== ARM $name ($(date)) extra: $*"
  python -u scripts/sweep.py --out results/r5_$name --seeds $seeds \
    --vmap 8 --shuffle timeperm --total-timesteps 30000000 \
    --snapshot-steps 3000000 6000000 9000000 12000000 18000000 24000000 \
    --init-params artifacts/agent_s8004/new_agent.npz \
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

run_arm pa75band150b 21600 16 --env PP_rew_max=8 --env PA_scale=7.5 --env PA_band_edge=150
run_arm pa10band150  21700 8  --env PP_rew_max=8 --env PA_scale=10 --env PA_band_edge=150
echo "=== DOSE2 COMPLETE ($(date))"
