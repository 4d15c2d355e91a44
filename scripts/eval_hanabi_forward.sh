#!/bin/sh
# Parity with reference scripts/eval_hanabi_forward.sh
python -m onpolicy_tpu.scripts.eval_hanabi \
    --env_name Hanabi --algorithm_name mappo --experiment_name check \
    --hanabi_name Hanabi-Full --num_agents 2 --seed 1 \
    --n_rollout_threads 1 --n_eval_rollout_threads 1000 --num_mini_batch 4 \
    --episode_length 100 --num_env_steps 10000000000000 --ppo_epoch 15 \
    --gain 0.01 --lr 7e-4 --critic_lr 1e-3 \
    --hidden_size 512 --layer_N 2 --use_eval \
    --use_recurrent_policy false --entropy_coef 0.015 --model_dir "${MODEL_DIR:?set MODEL_DIR to a run dir}"
