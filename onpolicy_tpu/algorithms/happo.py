"""HAPPO: Heterogeneous-Agent PPO trainer.

Parity with `/root/reference/onpolicy/algorithms/happo/happo_trainer.py`:
a per-agent R_MAPPO clone with two deltas —
  * the importance ratio is the joint Π_k exp(Δlogp_k) keepdim
    (`happo_trainer.py:131`);
  * the clipped surrogate is weighted by the running `factor` from the
    sequential agent-by-agent update (`happo_trainer.py:137-141`), which
    the separated runner maintains (base_runner.py:135-183);
  * `--use_popart` selects the stats-only normalizer (popart_hatrpo.py),
    not the rescaling head.
The sequential update loop itself lives in the separated runner — the
trainer is agnostic to its position in the agent order.
"""
from __future__ import annotations

from onpolicy_tpu.algorithms.mappo import MAPPO


class HAPPO(MAPPO):
    prod_ratio_heads = True
    popart_rescales_head = False
