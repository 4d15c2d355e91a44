"""Vectorized MPE particle physics as a pure function.

Re-derivation of the reference's per-entity Python loops
(`/root/reference/onpolicy/envs/mpe/core.py:207-361`) as batched array
ops over an entity axis; the whole step is jit/vmap-able and runs on
device for thousands of env instances in lockstep.

Semantics preserved exactly (quirks included):
  * action force = (mass·accel if accel set else mass) · u, where u was
    already scaled by sensitivity (=accel or 5.0) in the env layer — the
    reference double-scales accel (`core.py:229-238`,
    `environment.py:233-236`);
  * pairwise softmax-penetration collision forces with
    contact_force=100, contact_margin=1e-3 (`core.py:309-321`), mass-ratio
    weighting for movable-movable pairs;
  * semi-implicit Euler: v ← v·(1−damping) + F/m·dt; speed clamp;
    p ← p + v·dt (`core.py:265-278`), damping 0.25, dt 0.1;
  * comm state: zeros when silent else the comm action (+ optional noise)
    (`core.py:280-287`).

Entity order: agents then landmarks (the reference's `World.entities`).
Static per-entity metadata lives in `WorldSpec` (hashable tuples → usable
as a jit-static argument); dynamic state in `WorldState` (a pytree).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

DIM_P = 2
EPS = 1e-12


@dataclass(frozen=True)
class WallSpec:
    orient: str          # 'H' or 'V'
    axis_pos: float
    endpoints: Tuple[float, float]
    width: float = 0.1
    hard: bool = True


@dataclass(frozen=True)
class WorldSpec:
    n_agents: int
    n_landmarks: int
    dim_c: int
    world_length: int
    # per-agent static properties (tuples of length n_agents)
    agent_movable: Tuple[bool, ...]
    agent_silent: Tuple[bool, ...]
    agent_collide: Tuple[bool, ...]
    agent_size: Tuple[float, ...]
    agent_accel: Tuple[Optional[float], ...]
    agent_max_speed: Tuple[Optional[float], ...]
    agent_u_noise: Tuple[Optional[float], ...] = None
    agent_c_noise: Tuple[Optional[float], ...] = None
    agent_mass: Tuple[float, ...] = None
    agent_ghost: Tuple[bool, ...] = None
    agent_adversary: Tuple[bool, ...] = None
    # per-landmark
    landmark_collide: Tuple[bool, ...] = None
    landmark_movable: Tuple[bool, ...] = None
    landmark_size: Tuple[float, ...] = None
    landmark_mass: Tuple[float, ...] = None
    walls: Tuple[WallSpec, ...] = ()
    damping: float = 0.25
    dt: float = 0.1
    contact_force: float = 1e2
    contact_margin: float = 1e-3

    def __post_init__(self):
        def default(name, value):
            if getattr(self, name) is None:
                object.__setattr__(self, name, value)
        M, K = self.n_agents, self.n_landmarks
        default("agent_u_noise", (None,) * M)
        default("agent_c_noise", (None,) * M)
        default("agent_mass", (1.0,) * M)
        default("agent_ghost", (False,) * M)
        default("agent_adversary", (False,) * M)
        default("landmark_collide", (False,) * K)
        default("landmark_movable", (False,) * K)
        default("landmark_size", (0.05,) * K)
        default("landmark_mass", (1.0,) * K)

    # -- derived dense arrays over the entity axis (agents ++ landmarks) --
    @property
    def n_entities(self) -> int:
        return self.n_agents + self.n_landmarks

    def entity_arrays(self):
        """(sizes[E], collide[E], movable[E], mass[E]) as numpy."""
        sizes = np.array(self.agent_size + self.landmark_size, np.float64)
        collide = np.array(self.agent_collide + self.landmark_collide, bool)
        movable = np.array(self.agent_movable + self.landmark_movable, bool)
        mass = np.array(self.agent_mass + self.landmark_mass, np.float64)
        return sizes, collide, movable, mass


@struct.dataclass
class WorldState:
    agent_pos: jax.Array       # [M, 2]
    agent_vel: jax.Array       # [M, 2]
    agent_comm: jax.Array      # [M, dim_c] (dim_c may be 0)
    landmark_pos: jax.Array    # [K, 2]
    landmark_vel: jax.Array    # [K, 2]
    t: jax.Array               # scalar int32 step counter
    extras: dict = struct.field(default_factory=dict)  # scenario state (goals…)


def _collision_forces(spec: WorldSpec, pos: jax.Array) -> jax.Array:
    """Pairwise contact forces. pos: [E, 2] → net force [E, 2]."""
    sizes, collide, movable, mass = spec.entity_arrays()
    if not collide.any():
        return jnp.zeros_like(pos)
    delta = pos[:, None, :] - pos[None, :, :]                  # a - b
    dist = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(delta), -1), EPS))
    dist_min = sizes[:, None] + sizes[None, :]
    k = spec.contact_margin
    penetration = jnp.logaddexp(0.0, -(dist - dist_min) / k) * k
    force = spec.contact_force * delta / dist[..., None] * penetration[..., None]

    # pair validity: both collide, at least one movable, not self
    valid = (collide[:, None] & collide[None, :]
             & (movable[:, None] | movable[None, :]))
    valid &= ~np.eye(spec.n_entities, dtype=bool)
    # force on a from pair (a,b): ratio m_b/m_a when both movable, else 1;
    # zero when a immovable (core.py:313-321).
    both = movable[:, None] & movable[None, :]
    ratio = jnp.where(both, mass[None, :] / mass[:, None], 1.0)
    w = jnp.where(valid & movable[:, None], ratio, 0.0)
    return jnp.sum(w[..., None] * force, axis=1)


def _wall_forces(spec: WorldSpec, pos: jax.Array) -> jax.Array:
    """Wall contact forces on agents (`core.py:324-361`). pos: [M, 2]."""
    if not spec.walls:
        return jnp.zeros_like(pos)
    sizes = np.array(spec.agent_size, np.float64)[:, None]     # [M,1]
    ghost = np.array(spec.agent_ghost, bool)
    total = jnp.zeros_like(pos)
    for wall in spec.walls:
        prll, perp = (0, 1) if wall.orient == "H" else (1, 0)
        p_prll = pos[:, prll]
        p_perp = pos[:, perp]
        lo, hi = wall.endpoints
        s = sizes[:, 0]
        beyond = (p_prll < lo - s) | (p_prll > hi + s)
        past_lo = jnp.where(p_prll < lo, p_prll - lo, 0.0)
        past_hi = jnp.where(p_prll > hi, p_prll - hi, 0.0)
        dist_past_end = past_lo + past_hi
        partial = (p_prll < lo) | (p_prll > hi)
        theta = jnp.where(partial,
                          jnp.arcsin(jnp.clip(dist_past_end / s, -1.0, 1.0)),
                          0.0)
        dist_min = jnp.where(partial,
                             jnp.cos(theta) * s + 0.5 * wall.width,
                             s + 0.5 * wall.width)
        delta = p_perp - wall.axis_pos
        dist = jnp.maximum(jnp.abs(delta), EPS)
        k = spec.contact_margin
        penetration = jnp.logaddexp(0.0, -(dist - dist_min) / k) * k
        fmag = spec.contact_force * delta / dist * penetration
        f = jnp.zeros_like(pos)
        f = f.at[:, perp].set(jnp.cos(theta) * fmag)
        f = f.at[:, prll].set(jnp.sin(theta) * jnp.abs(fmag))
        applies = ~beyond & ~(ghost & (not wall.hard))
        total = total + jnp.where(applies[:, None], f, 0.0)
    return total


def physics_step(spec: WorldSpec, state: WorldState, u: jax.Array,
                 c: jax.Array, key: jax.Array) -> WorldState:
    """One world step. u: [M, 2] sensitivity-scaled control; c: [M, dim_c]."""
    M = spec.n_agents
    accel = np.array([a if a is not None else np.nan
                      for a in spec.agent_accel], np.float64)
    mass_a = np.array(spec.agent_mass, np.float64)
    movable_a = np.array(spec.agent_movable, bool)
    # force = mass·accel·u when accel set, else mass·u (core.py:236-237)
    factor = np.where(np.isnan(accel), mass_a, mass_a * accel)
    action_force = factor[:, None] * u

    u_noise = np.array([n if n else 0.0 for n in spec.agent_u_noise], np.float64)
    if u_noise.any():
        key, kn = jax.random.split(key)
        action_force = action_force + jax.random.normal(kn, u.shape) * u_noise[:, None]
    action_force = jnp.where(movable_a[:, None], action_force, 0.0)

    pos = jnp.concatenate([state.agent_pos, state.landmark_pos], 0)
    vel = jnp.concatenate([state.agent_vel, state.landmark_vel], 0)
    force = _collision_forces(spec, pos)
    force = force.at[:M].add(action_force)
    force = force.at[:M].add(_wall_forces(spec, state.agent_pos))

    _, _, movable, mass = spec.entity_arrays()
    new_vel = vel * (1.0 - spec.damping) + (force / mass[:, None]) * spec.dt
    max_speed = np.array(
        [s if s is not None else np.nan for s in spec.agent_max_speed]
        + [np.nan] * spec.n_landmarks, np.float64)
    speed = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(new_vel), -1), EPS))
    clamp = ~np.isnan(max_speed) & (speed > jnp.nan_to_num(max_speed, nan=np.inf))
    scale = jnp.where(clamp, jnp.nan_to_num(max_speed, nan=1.0) / speed, 1.0)
    new_vel = new_vel * scale[:, None]
    new_vel = jnp.where(movable[:, None], new_vel, vel)
    new_pos = jnp.where(movable[:, None], pos + new_vel * spec.dt, pos)

    # communication state
    silent = np.array(spec.agent_silent, bool)
    if spec.dim_c > 0:
        comm = c
        c_noise = np.array([n if n else 0.0 for n in spec.agent_c_noise],
                           np.float64)
        if c_noise.any():
            key, kc = jax.random.split(key)
            comm = comm + jax.random.normal(kc, c.shape) * c_noise[:, None]
        comm = jnp.where(silent[:, None], 0.0, comm)
    else:
        comm = state.agent_comm

    return state.replace(
        agent_pos=new_pos[:M], agent_vel=new_vel[:M],
        landmark_pos=new_pos[M:], landmark_vel=new_vel[M:],
        agent_comm=comm, t=state.t + 1)
