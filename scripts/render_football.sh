#!/bin/sh
# Parity with reference scripts/render_football.sh
python -m onpolicy_tpu.scripts.render_football \
    --env_name Football --scenario_name academy_3_vs_1_with_keeper --algorithm_name rmappo \
    --experiment_name render --seed 1 --num_agents 3 \
    --representation simple115v2 --use_render --render_episodes 10 \
    --n_rollout_threads 1 --model_dir "${MODEL_DIR:?set MODEL_DIR to a run dir}" --save_videos
