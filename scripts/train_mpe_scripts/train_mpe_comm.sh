#!/bin/sh
# speaker_listener requires separated policies (share_policy false)
env="MPE"; scenario="simple_speaker_listener"; num_landmarks=3; num_agents=2
algo="rmappo"; exp="check"
python -m onpolicy_tpu.scripts.train_mpe --env_name ${env} \
    --algorithm_name ${algo} --experiment_name ${exp} \
    --scenario_name ${scenario} --num_agents ${num_agents} \
    --num_landmarks ${num_landmarks} --seed 1 --share_policy false \
    --n_rollout_threads 128 --num_mini_batch 1 --episode_length 25 \
    --num_env_steps 20000000 --ppo_epoch 15 --use_ReLU \
    --gain 0.01 --lr 7e-4 --critic_lr 7e-4
