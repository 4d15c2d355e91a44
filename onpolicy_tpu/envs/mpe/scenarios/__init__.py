"""Scenario registry (`/root/reference/onpolicy/envs/mpe/scenarios/
__init__.py` loads by filename; we use an explicit module map)."""
from __future__ import annotations

import importlib

_SCENARIOS = {
    "simple_spread": "onpolicy_tpu.envs.mpe.scenarios.simple_spread",
    "simple_reference": "onpolicy_tpu.envs.mpe.scenarios.simple_reference",
    "simple_speaker_listener":
        "onpolicy_tpu.envs.mpe.scenarios.simple_speaker_listener",
    "simple_adversary": "onpolicy_tpu.envs.mpe.scenarios.simple_adversary",
    "simple_tag": "onpolicy_tpu.envs.mpe.scenarios.simple_tag",
    "simple_push": "onpolicy_tpu.envs.mpe.scenarios.simple_push",
    "simple_attack": "onpolicy_tpu.envs.mpe.scenarios.simple_attack",
    "simple_crypto": "onpolicy_tpu.envs.mpe.scenarios.simple_crypto",
    "simple_crypto_display":
        "onpolicy_tpu.envs.mpe.scenarios.simple_crypto_display",
    "simple_world_comm": "onpolicy_tpu.envs.mpe.scenarios.simple_world_comm",
}


def load(name: str):
    if name not in _SCENARIOS:
        raise ValueError(
            f"unknown MPE scenario {name!r}; available: {sorted(_SCENARIOS)}")
    return importlib.import_module(_SCENARIOS[name])


def available():
    return sorted(_SCENARIOS)
