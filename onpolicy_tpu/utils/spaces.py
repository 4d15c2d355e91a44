"""Lightweight, hashable space descriptors.

The reference dispatches on gym space classes
(`/root/reference/onpolicy/algorithms/utils/act.py:20-42`,
`/root/reference/onpolicy/utils/util.py:30-72`). We use frozen dataclasses
so spaces are hashable static metadata for jit (no gym dependency in the
compute path); adapters convert from gym spaces at the env boundary.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class Discrete:
    n: int


@dataclass(frozen=True)
class Box:
    shape: Tuple[int, ...]
    low: float = -1.0
    high: float = 1.0


@dataclass(frozen=True)
class MultiDiscrete:
    nvec: Tuple[int, ...]


@dataclass(frozen=True)
class MultiBinary:
    n: int


@dataclass(frozen=True)
class MixedSpace:
    """Tuple(Box, Discrete) — the reference's 'mixed' action space."""
    continuous_dim: int
    discrete_n: int


Space = object  # union alias for docs


def obs_dim(space) -> int:
    """Flat feature dimension of an observation space (`get_shape_from_obs_space`)."""
    if isinstance(space, Box):
        if len(space.shape) == 1:
            return space.shape[0]
        raise ValueError(f"non-flat obs space {space}; use shape directly")
    raise TypeError(f"unsupported obs space {space!r}")


def obs_shape(space) -> Tuple[int, ...]:
    if isinstance(space, Box):
        return tuple(space.shape)
    if isinstance(space, Discrete):
        return (space.n,)
    raise TypeError(f"unsupported obs space {space!r}")


def action_storage_dim(space) -> int:
    """Width of the stored action array (`get_shape_from_act_space`,
    reference utils/util.py:46-58)."""
    if isinstance(space, Discrete):
        return 1
    if isinstance(space, MultiDiscrete):
        return len(space.nvec)
    if isinstance(space, Box):
        return space.shape[0]
    if isinstance(space, MultiBinary):
        return space.n
    if isinstance(space, MixedSpace):
        return space.continuous_dim + 1
    raise TypeError(f"unsupported action space {space!r}")


def log_prob_dim(space) -> int:
    """Width of the stored log-prob array. Scalar (1) for all spaces except
    MultiDiscrete, where the reference keeps per-head log-probs
    (`act.py:78-79`)."""
    if isinstance(space, MultiDiscrete):
        return len(space.nvec)
    return 1


def env_action_dim(space) -> int:
    """Width of the action as presented TO the env (one-hot for discrete,
    matching `mpe_runner.collect:111-121`)."""
    if isinstance(space, Discrete):
        return space.n
    if isinstance(space, MultiDiscrete):
        return sum(space.nvec)
    return action_storage_dim(space)


def available_actions_dim(space) -> int:
    if isinstance(space, Discrete):
        return space.n
    raise TypeError("available_actions only defined for Discrete spaces")


def from_gym(space):
    """Convert a gym/gymnasium space to a descriptor (host-env adapters)."""
    name = type(space).__name__
    if name == "Discrete":
        return Discrete(int(space.n))
    if name == "Box":
        return Box(tuple(int(s) for s in space.shape))
    if name == "MultiDiscrete":
        if hasattr(space, "nvec"):
            nvec = tuple(int(n) for n in space.nvec)
        else:  # the reference's vendored MultiDiscrete (high-low+1)
            nvec = tuple(int(h - l + 1) for l, h in zip(space.low, space.high))
        return MultiDiscrete(nvec)
    if name == "MultiBinary":
        return MultiBinary(int(space.n))
    if name == "Tuple":
        return MixedSpace(int(space[0].shape[0]), int(space[1].n))
    raise TypeError(f"unsupported gym space {space!r}")
