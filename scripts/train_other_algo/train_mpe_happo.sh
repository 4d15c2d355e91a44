#!/bin/sh
python -m onpolicy_tpu.scripts.train_mpe --env_name MPE \
    --algorithm_name happo --experiment_name check \
    --scenario_name simple_spread --num_agents 3 --num_landmarks 3 \
    --seed 1 --n_rollout_threads 128 --episode_length 25 \
    --num_env_steps 20000000 --ppo_epoch 10 --lr 7e-4 --critic_lr 7e-4
