"""Headless rendering tests."""
import numpy as np
import jax

from onpolicy_tpu.envs.mpe.env import MPEEnv
from onpolicy_tpu.utils.render import render_frame, save_gif


def test_render_frame_and_gif(tmp_path):
    env = MPEEnv("simple_spread", 3, 3, 25)
    state, obs = env.reset(jax.random.PRNGKey(0))
    frame = render_frame(env.spec, state, size=200)
    assert frame.shape == (200, 200, 3)
    assert frame.dtype == np.uint8
    # agents/landmarks actually drawn (image isn't blank)
    assert frame.std() > 1.0
    path = save_gif([frame, frame], tmp_path / "t.gif", fps=5)
    assert path.exists() and path.stat().st_size > 0
