"""onpolicy_tpu — a TPU-native multi-agent on-policy RL framework.

A from-scratch JAX/XLA/pjit re-design of the capabilities of
marlbenchmark/on-policy (MAPPO and friends): synchronous on-policy
actor-learner training with parameter-shared or separated recurrent
actor-critic policies, centralized critics, GAE with value normalization,
and six algorithm variants (MAPPO / IPPO / rMAPPO / HAPPO / HATRPO / MAT)
over five environment families (MPE, SMAC, SMACv2, Hanabi, GRF).

Design (vs. the reference's host-loop + env-subprocess architecture):
  * rollout collection, GAE, and the PPO update are jit-compiled XLA
    programs — `lax.scan` over time, not a Python step loop;
  * MPE is a pure-JAX vectorized engine stepping thousands of env
    instances in lockstep on device;
  * external engines (SMAC/Hanabi/GRF) feed through a batched host
    ingestion path;
  * scaling is mesh-sharded (`jax.sharding`) over the env batch axis with
    XLA collectives, not subprocess pipes.
"""

__version__ = "0.1.0"
