#!/bin/sh
# Parity with reference scripts/render_mpe.sh
python -m onpolicy_tpu.scripts.render_mpe \
    --save_gifs --share_policy false --env_name MPE \
    --algorithm_name rmappo --experiment_name check --scenario_name simple_speaker_listener \
    --num_agents 2 --num_landmarks 3 --seed 1 \
    --n_rollout_threads 1 --use_render --episode_length 25 \
    --render_episodes 5 --model_dir "${MODEL_DIR:?set MODEL_DIR to a run dir}"
