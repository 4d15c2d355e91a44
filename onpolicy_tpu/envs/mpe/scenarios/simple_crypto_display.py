"""simple_crypto_display: render/debug variant of simple_crypto.

Parity with `/root/reference/onpolicy/envs/mpe/scenarios/
simple_crypto_display.py`: identical 3-agent comm game (Eve/Bob/Alice,
dim_c=4, random goal + key landmark channels, same rewards/observations
as simple_crypto) but with DETERMINISTIC reset layout for display —
agents on the vertical line x=0 at y = -0.5 + i/(M-1)
(`simple_crypto_display.py:71-75`), landmarks on x=0.5 at
y = 0.5 - 0.5·i/(K-1) (`:77-80`). The reference also enables debug
prints and colors the goal landmark; only the state-affecting layout
matters here (rendering colors live in utils/render.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from onpolicy_tpu.envs.mpe import scenario as sc
from onpolicy_tpu.envs.mpe.scenarios import simple_crypto as _crypto

shared_reward = _crypto.shared_reward
DIM_C = _crypto.DIM_C

make_spec = _crypto.make_spec
observation = _crypto.observation
reward = _crypto.reward


def reset(spec, key: jax.Array):
    kg, kk = jax.random.split(key)
    M, K = spec.n_agents, spec.n_landmarks
    agent_y = -0.5 + jnp.arange(M, dtype=jnp.float32) / max(M - 1, 1)
    agent_pos = jnp.stack([jnp.zeros(M, jnp.float32), agent_y], axis=-1)
    lm_y = 0.5 - 0.5 * jnp.arange(K, dtype=jnp.float32) / max(K - 1, 1)
    landmark_pos = jnp.stack([jnp.full((K,), 0.5, jnp.float32), lm_y], axis=-1)
    goal = jax.random.randint(kg, (), 0, K)
    key_idx = jax.random.randint(kk, (), 0, K)
    return sc.base_state(spec, agent_pos, landmark_pos,
                         extras={"goal": goal, "key": key_idx})
