#!/bin/sh
# Parity with reference scripts/train_smacv2_scripts/train_terran_20v20.sh
# reference sweeps seeds 1..3; pass --seed N
python -m onpolicy_tpu.scripts.train_smac \
    --env_name StarCraft2v2 --algorithm_name rmappo --experiment_name tune2 \
    --map_name 10gen_terran --seed 1 --units 20v20 \
    --n_rollout_threads 8 --num_mini_batch 1 --episode_length 400 \
    --num_env_steps 20000000 --ppo_epoch 5 --use_value_active_masks false \
    --use_eval --eval_episodes 32
