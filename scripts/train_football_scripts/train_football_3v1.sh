#!/bin/sh
# GRF academy_3_vs_1_with_keeper (parity: reference train_football_3v1.sh)
python -m onpolicy_tpu.scripts.train_football --env_name Football \
    --algorithm_name rmappo --experiment_name check \
    --scenario_name academy_3_vs_1_with_keeper --num_agents 3 --seed 1 \
    --n_rollout_threads 50 --num_mini_batch 2 --episode_length 200 \
    --num_env_steps 25000000 --ppo_epoch 15 \
    --representation simple115v2 --rewards scoring,checkpoints \
    --use_eval --eval_episodes 32
