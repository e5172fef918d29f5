#!/bin/bash
# r5 wave 4: close the last 0.1-4 px (stage_5 <= 35 AND corridor <= 104 AND
# stage_1 1000/1000, jointly). The adherence optimum sits at 3-9M of the
# fine-tune, so train only 12M with dense early snapshots; widen the
# pa10band150 pool (its two n=1000 finalists bracketed the target) and
# iterate gen-2 from the strict near-miss seed_21706/6M.
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

run_arm pa10band150b 22000 24 artifacts/agent_s8004/new_agent.npz \
  --env PP_rew_max=8 --env PA_scale=10 --env PA_band_edge=150
run_arm pa10gen2 22100 16 results/r5_pa10band150/seed_21706/ckpt_6029312.npz \
  --env PP_rew_max=8 --env PA_scale=10 --env PA_band_edge=150
run_arm pa12band150 22200 8 artifacts/agent_s8004/new_agent.npz \
  --env PP_rew_max=8 --env PA_scale=12 --env PA_band_edge=150
echo "=== DOSE4 COMPLETE ($(date))"
