#!/bin/bash
# r5 pace<->adherence dose-response (VERDICT r4 next #1b).
# Six 8-seed x 30M fine-tune arms from agent_s8004 (the h8 recipe with the
# PA knobs varied), each followed by both-RNG selection with AAPE coverage.
# Arms run strictly sequentially: ONE process may use the TPU at a time.
set -u
cd /root/repo

# wait for any prior TPU job (survivorship campaign) to release the chip
while pgrep -x python -a | grep -q "aape_survivorship"; do sleep 20; done

run_arm() {
  local name="$1"; shift
  local seeds_base="$1"; shift
  local seeds=$(seq $seeds_base $((seeds_base + 7)))
  echo "=== ARM $name ($(date)) extra: $*"
  python -u scripts/sweep.py --out results/r5_$name --seeds $seeds \
    --vmap 8 --shuffle timeperm --total-timesteps 30000000 \
    --snapshot-steps 6000000 12000000 18000000 24000000 \
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

run_arm pa4band150  21200 --env PP_rew_max=8 --env PA_scale=4 --env PA_band_edge=150
run_arm pa4         21000 --env PP_rew_max=8 --env PA_scale=4
run_arm band150     21100 --env PP_rew_max=8 --env PA_band_edge=150
run_arm pa75band150 21300 --env PP_rew_max=8 --env PA_scale=7.5 --env PA_band_edge=150
run_arm pp5         21400 --env PP_rew_max=5
run_arm pp35        21500 --env PP_rew_max=3.5
echo "=== DOSE-RESPONSE COMPLETE ($(date))"
