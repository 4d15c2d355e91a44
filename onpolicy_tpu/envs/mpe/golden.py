"""Reference-exact MPE resets: the numpy RNG mapping.

The reference scenarios draw initial states from the GLOBAL numpy stream
inside `reset_world` (`/root/reference/onpolicy/envs/mpe/scenarios/*.py`);
seeding is `np.random.seed(seed)` at env construction
(`MPE_env.py` / training scripts). Our device resets use jax PRNG keys, so
fixed-seed initial states differ by design. This module replays each
scenario's exact `np.random` draw ORDER on host, producing a `WorldState`
bit-identical (in float64) to the reference's post-reset world — the
documented RNG mapping required for exact fixed-seed trajectory parity
(BASELINE north star; exercised by tests/test_mpe_golden_exact.py).

Draw orders (verified against each reference scenario's reset_world):

  scenario                 | goal draws (np.random.choice)    | agent pos | landmark pos
  -------------------------|----------------------------------|-----------|--------------
  simple_spread            | —                                | U(-1,1)²  | 0.8·U(-1,1)²
  simple_reference         | goal_b[0], goal_b[1]             | U         | 0.8·U
  simple_speaker_listener  | goal                             | U         | U (no 0.8)
  simple_adversary         | goal (BEFORE positions)          | U         | U
  simple_crypto            | goal, key                        | U         | U
  simple_crypto_display    | goal, key                        | fixed     | fixed
  simple_push              | goal                             | U         | 0.8·U
  simple_tag               | —                                | U         | 0.8·U
  simple_attack            | —                                | U         | 0.8·U
  simple_world_comm        | —                                | U         | 0.8·U (landmarks+food+forests, in that order)

`np.random.choice(sequence)` consumes exactly one randint from the
stream, so `np.random.randint(K)`-equivalent `np.random.choice(K)`
reproduces it.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from onpolicy_tpu.envs.mpe.world import WorldSpec, WorldState

# scenarios whose landmarks are NOT scaled by 0.8
_UNSCALED_LANDMARKS = {"simple_adversary", "simple_crypto",
                       "simple_speaker_listener"}


def reference_reset(scenario_name: str, spec: WorldSpec,
                    dtype=jnp.float32) -> WorldState:
    """Draw a post-reset WorldState from the CURRENT global np.random
    stream with the reference's exact draw order. Seed with
    `np.random.seed(seed)` beforehand, as the reference does."""
    M, K, C = spec.n_agents, spec.n_landmarks, spec.dim_c
    extras = {}

    def choice():
        return int(np.random.choice(K))

    if scenario_name == "simple_adversary":
        extras["goal"] = jnp.asarray(choice())
    elif scenario_name == "simple_reference":
        extras["goal_b"] = jnp.asarray([choice(), choice()])
    elif scenario_name == "simple_speaker_listener":
        extras["goal"] = jnp.asarray(choice())
    elif scenario_name in ("simple_crypto", "simple_crypto_display"):
        extras["goal"] = jnp.asarray(choice())
        extras["key"] = jnp.asarray(choice())
    elif scenario_name == "simple_push":
        extras["goal"] = jnp.asarray(choice())

    if scenario_name == "simple_crypto_display":
        # deterministic layout (reference comments out the random draws)
        agent_pos = np.stack(
            [np.array([0.0, -0.5 + 1.0 / max(M - 1, 1) * i])
             for i in range(M)])
        landmark_pos = np.stack(
            [np.array([0.5, 0.5 - 0.5 / max(K - 1, 1) * i])
             for i in range(K)])
    else:
        agent_pos = np.stack(
            [np.random.uniform(-1, +1, 2) for _ in range(M)])
        scale = 1.0 if scenario_name in _UNSCALED_LANDMARKS else 0.8
        landmark_pos = np.stack(
            [scale * np.random.uniform(-1, +1, 2) for _ in range(K)])
        if scenario_name == "simple_world_comm":
            # reference `world.landmarks` already CONTAINS food+forests
            # (simple_world_comm.py:51-52), so the landmark loop draws all
            # K positions and the food/forest loops then REDRAW the last
            # 2+2 (`reset_world`, :104-112)
            for i in range(K - 4, K):
                landmark_pos[i] = 0.8 * np.random.uniform(-1, +1, 2)

    return WorldState(
        agent_pos=jnp.asarray(agent_pos, dtype),
        agent_vel=jnp.zeros((M, 2), dtype),
        agent_comm=jnp.zeros((M, max(C, 1)), dtype),
        landmark_pos=jnp.asarray(landmark_pos, dtype),
        landmark_vel=jnp.zeros((K, 2), dtype),
        t=jnp.zeros((), jnp.int32),
        extras=extras,
    )
