#!/bin/bash
# r5 wave 5: break the stage_1-timeout vs stage_5-APE trade.
# Diagnosis (stage1_failure_modes on 22103/6M): heavy-PA stage_1 failures
# are 100% slow-flight timeouts at APE<10 px -> raise the pace saturation
# alongside PA10 (PP 10 and 12 as fine-tunes), plus a light-PA gen-2
# polish of a 12/12-AAPE candidate to restore speed margin.
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

run_arm pp10pa10band150 22300 16 artifacts/agent_s8004/new_agent.npz \
  --env PP_rew_max=10 --env PA_scale=10 --env PA_band_edge=150
run_arm pp12pa10band150 22500 8 artifacts/agent_s8004/new_agent.npz \
  --env PP_rew_max=12 --env PA_scale=10 --env PA_band_edge=150
run_arm pa75gen2lite 22600 8 results/r5_pa10band150b/seed_22000/ckpt_6029312.npz \
  --env PP_rew_max=8 --env PA_scale=7.5 --env PA_band_edge=150
echo "=== DOSE5 COMPLETE ($(date))"
