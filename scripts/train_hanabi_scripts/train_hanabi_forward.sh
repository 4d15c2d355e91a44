#!/bin/sh
# Parity with reference scripts/train_hanabi_forward.sh
python -m onpolicy_tpu.scripts.train_hanabi \
    --env_name Hanabi --algorithm_name mappo --experiment_name check \
    --hanabi_name Hanabi-Full --num_agents 2 --seed 1 \
    --n_rollout_threads 1000 --num_mini_batch 1 --episode_length 100 \
    --num_env_steps 10000000000000 --ppo_epoch 15 --gain 0.01 \
    --lr 7e-4 --critic_lr 1e-3 --hidden_size 512 \
    --layer_N 2 --entropy_coef 0.015
