#!/bin/bash
# r5 wave 7: mean-plateau probe — does adherence-lineage diversity break the
# ~0.88 mean ceiling when fine-tuned back to the mean recipe? Uses the
# shipped preset end-to-end (dogfood of --preset flagship-finetune).
set -u
cd /root/repo

run_arm() {
  local name="$1"; shift
  local seeds_base="$1"; shift
  local n="$1"; shift
  local init="$1"; shift
  local seeds=$(seq $seeds_base $((seeds_base + n - 1)))
  echo "=== ARM $name ($(date)) init: $init"
  python -u scripts/sweep.py --out results/r5_$name --seeds $seeds \
    --vmap 8 --preset flagship-finetune \
    --snapshot-steps 6000000 12000000 18000000 24000000 \
    --init-params "$init" \
    > logs/r5/arm_$name.log 2>&1 || { echo "ARM $name TRAIN FAILED"; return 1; }
  python -u scripts/select_agents.py results/r5_$name/seed_* \
    --episodes 100 --seed 0 --out results/r5_$name/select.json \
    >> logs/r5/arm_$name.log 2>&1
  python -u scripts/select_agents.py results/r5_$name/seed_* \
    --episodes 100 --seed 777 --out results/r5_$name/select777.json \
    >> logs/r5/arm_$name.log 2>&1
  echo "=== ARM $name done ($(date))"
}

run_arm meanpush1 23000 8 results/r5_pa10gen2/seed_22103/ckpt_3014656.npz
run_arm meanpush2 23100 8 results/r5_pp10pa10band150/seed_22307/ckpt_9043968.npz
echo "=== DOSE7 COMPLETE ($(date))"
