#!/bin/sh
# MPE simple_spread, rMAPPO — paper benchmark config
# (parity: reference onpolicy/scripts/train_mpe_scripts/train_mpe_spread.sh)
env="MPE"
scenario="simple_spread"
num_landmarks=3
num_agents=3
algo="rmappo"
exp="check"
seed_max=1

for seed in $(seq 1 ${seed_max}); do
    echo "seed is ${seed}:"
    python -m onpolicy_tpu.scripts.train_mpe --env_name ${env} \
        --algorithm_name ${algo} --experiment_name ${exp} \
        --scenario_name ${scenario} --num_agents ${num_agents} \
        --num_landmarks ${num_landmarks} --seed ${seed} \
        --n_rollout_threads 128 --num_mini_batch 1 --episode_length 25 \
        --num_env_steps 20000000 --ppo_epoch 10 --use_ReLU \
        --gain 0.01 --lr 7e-4 --critic_lr 7e-4
done
