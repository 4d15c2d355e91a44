#!/bin/sh
# Parity with reference scripts/train_smac_scripts/train_smac_bane_vs_bane.sh
python -m onpolicy_tpu.scripts.train_smac \
    --env_name StarCraft2 --algorithm_name rmappo --experiment_name check \
    --map_name bane_vs_bane --seed 1 --n_rollout_threads 8 \
    --num_mini_batch 1 --episode_length 400 --num_env_steps 10000000 \
    --ppo_epoch 15 --use_value_active_masks false --use_eval \
    --eval_episodes 32
