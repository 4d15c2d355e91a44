#!/bin/sh
# Hanabi-Full 2p, paper config, FULLY DEVICE-RESIDENT (round-2 TPU path):
# --use_jax_env runs the bit-exact pure-JAX engine, --use_scan_rounds
# compiles each episode (100 seat rounds + env stepping + deferred PPO)
# into one XLA program with zero host callbacks. Measured: score 0 -> 12.6
# in ~45 min on one v5e chip (RESULTS.md "Hanabi-Full at paper scale").
# rmappo = the reference's recurrent policy (its config.py default).
python -m onpolicy_tpu.scripts.train_hanabi --env_name Hanabi \
    --algorithm_name rmappo --experiment_name device \
    --hanabi_name Hanabi-Full --num_agents 2 --seed 1 \
    --n_rollout_threads 1000 --num_mini_batch 1 --episode_length 100 \
    --num_env_steps 10000000000 --ppo_epoch 15 --gain 0.01 \
    --lr 7e-4 --critic_lr 1e-3 --hidden_size 512 --layer_N 2 \
    --entropy_coef 0.015 --use_scan_rounds --use_jax_env \
    --log_interval 1 --save_interval 5
