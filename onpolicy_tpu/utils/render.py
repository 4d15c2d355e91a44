"""MPE rendering: rasterize world states to RGB frames and gifs.

Replaces the reference's pyglet viewer
(`/root/reference/onpolicy/envs/mpe/rendering.py`, `mpe_runner.render:
185-248`) with a headless matplotlib rasterizer — suitable for CI and
remote TPU hosts (no GL context needed).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Sequence

import numpy as np

AGENT_COLOR = (0.25, 0.25, 0.75)
ADVERSARY_COLOR = (0.75, 0.25, 0.25)
LANDMARK_COLOR = (0.25, 0.25, 0.25)


def render_frame(spec, state, size: int = 400, bound: float = 1.4
                 ) -> np.ndarray:
    """WorldState → RGB uint8 [size, size, 3]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(size / 100, size / 100), dpi=100)
    ax.set_xlim(-bound, bound)
    ax.set_ylim(-bound, bound)
    ax.set_aspect("equal")
    ax.axis("off")
    lm = np.asarray(state.landmark_pos)
    for k in range(spec.n_landmarks):
        ax.add_patch(plt.Circle(lm[k], spec.landmark_size[k],
                                color=LANDMARK_COLOR, alpha=0.6))
    ap = np.asarray(state.agent_pos)
    for i in range(spec.n_agents):
        color = ADVERSARY_COLOR if spec.agent_adversary[i] else AGENT_COLOR
        ax.add_patch(plt.Circle(ap[i], spec.agent_size[i], color=color,
                                alpha=0.85))
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def save_gif(frames: Sequence[np.ndarray], path, fps: float = 10.0):
    import imageio
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    imageio.mimsave(str(path), list(frames), duration=1.0 / fps, loop=0)
    return path


def save_video(frames: Sequence[np.ndarray], path, fps: float = 10.0):
    """Save mp4 via imageio/ffmpeg (reference dumps .avi through the GRF
    engine, render_football.py:87); falls back to gif when no ffmpeg."""
    import imageio
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    try:
        imageio.mimsave(str(path), list(frames), fps=fps)
        return path
    except Exception:
        alt = str(Path(path).with_suffix(".gif"))
        return save_gif(frames, alt, fps=fps)
