#!/bin/sh
python -m onpolicy_tpu.scripts.train_smac --env_name StarCraft2v2 \
    --algorithm_name rmappo --experiment_name check \
    --map_name 10gen_protoss --units 10v10 \
    --seed 1 --n_rollout_threads 8 --num_mini_batch 1 \
    --episode_length 400 --num_env_steps 20000000 --ppo_epoch 5 \
    --use_value_active_masks --use_eval
