#!/bin/sh
# Parity with reference scripts/train_football_scripts/train_football_ca_easy.sh
python -m onpolicy_tpu.scripts.train_football \
    --env_name Football --scenario_name academy_counterattack_easy --algorithm_name rmappo \
    --experiment_name check --seed 1 --num_agents 4 \
    --num_env_steps 25000000 --episode_length 200 --representation simple115v2 \
    --rewards scoring,checkpoints --n_rollout_threads 50 --ppo_epoch 15 \
    --num_mini_batch 2 --save_interval 200000 --log_interval 200000 \
    --use_eval --eval_interval 400000 --n_eval_rollout_threads 100 \
    --eval_episodes 100
