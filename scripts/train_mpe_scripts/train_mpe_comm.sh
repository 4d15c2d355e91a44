#!/bin/sh
# Parity with reference scripts/train_mpe_scripts/train_mpe_comm.sh
python -m onpolicy_tpu.scripts.train_mpe \
    --env_name MPE --algorithm_name rmappo --experiment_name check \
    --scenario_name simple_speaker_listener --num_agents 2 --num_landmarks 3 \
    --seed 1 --n_rollout_threads 128 --num_mini_batch 1 \
    --episode_length 25 --num_env_steps 2000000 --ppo_epoch 15 \
    --gain 0.01 --lr 7e-4 --critic_lr 7e-4 \
    --share_policy false
