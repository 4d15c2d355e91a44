#!/bin/sh
# Parity with reference scripts/train_other_algo/train_mat_dec.sh
python -m onpolicy_tpu.scripts.train_smac \
    --env_name StarCraft2v2 --algorithm_name mat_dec --experiment_name test \
    --map_name 10gen_protoss --seed 1 --units 5v5 \
    --n_rollout_threads 2 --num_mini_batch 1 --episode_length 400 \
    --num_env_steps 20000000 --ppo_epoch 5 --use_value_active_masks false \
    --use_eval --eval_episodes 32 --use_recurrent_policy false
