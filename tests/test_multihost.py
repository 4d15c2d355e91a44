"""Multi-host (2-process) training equality test.

VERDICT round-1 item 4: actually exercise `parallel/distributed.py`.
Two CPU processes (4 virtual devices each) jax.distributed-connect into
one 8-device slice, run sharded MAPPO episodes through the REAL
SharedRunner (params replicated globally, env batch sharded per host via
`make_array_from_process_local_data`), and must produce metrics equal to
a single-process 8-device run — proving the mesh annotations and the
XLA-inserted gradient/normalizer collectives span processes unchanged
(SURVEY §5.8; BASELINE "≥80% scaling at ≥2 hosts" needs this to be
correct before it can be fast).
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
pid = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
from onpolicy_tpu.parallel import distributed
distributed.initialize(coordinator_address="127.0.0.1:" + port,
                       num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.runner.shared_runner import SharedRunner

cfg = config_from_args(
    ["--algorithm_name", "mappo", "--scenario_name", "simple_spread",
     "--num_agents", "3", "--n_rollout_threads", "32",
     "--episode_length", "10", "--num_env_steps", "960",
     "--ppo_epoch", "2", "--num_mini_batch", "1", "--hidden_size", "32",
     "--layer_N", "1", "--seed", "7"],
    mesh_shape=distributed.global_mesh_shape())
runner = SharedRunner(cfg)
key = jax.random.PRNGKey(0)
key, k_init = jax.random.split(key)
train_state, carry = runner.init(k_init)

rows = []
for _ in range(3):
    key, k = jax.random.split(key)
    train_state, carry, metrics = runner._episode_fn(train_state, carry, k)
    rows.append({k2: float(v) for k2, v in jax.device_get(metrics).items()})
with open(out_path, "w") as f:
    json.dump(rows, f)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_rows():
    import jax
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.runner.shared_runner import SharedRunner
    cfg = config_from_args(
        ["--algorithm_name", "mappo", "--scenario_name", "simple_spread",
         "--num_agents", "3", "--n_rollout_threads", "32",
         "--episode_length", "10", "--num_env_steps", "960",
         "--ppo_epoch", "2", "--num_mini_batch", "1", "--hidden_size", "32",
         "--layer_N", "1", "--seed", "7"],
        mesh_shape=(8,))
    runner = SharedRunner(cfg)
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    train_state, carry = runner.init(k_init)
    rows = []
    for _ in range(3):
        key, k = jax.random.split(key)
        train_state, carry, metrics = runner._episode_fn(train_state, carry, k)
        rows.append({k2: float(v) for k2, v in jax.device_get(metrics).items()})
    return rows


@pytest.mark.slow
def test_two_process_matches_single(tmp_path):
    port = str(_free_port())
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # drop the parent's virtual-device flag: workers set their own
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    outs = [str(tmp_path / f"metrics_{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port, outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), \
        "worker failed:\n" + "\n----\n".join(logs)

    rows0 = json.load(open(outs[0]))
    rows1 = json.load(open(outs[1]))
    single = _single_process_rows()
    assert len(rows0) == len(single) == 3
    for ep, (a, b, s) in enumerate(zip(rows0, rows1, single)):
        assert a.keys() == s.keys()
        for k in s:
            # both workers agree bit-for-bit (same global program)...
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-6,
                                       err_msg=f"ep{ep} {k} worker mismatch")
            # ...and match the single-process run to reduction-order noise
            np.testing.assert_allclose(a[k], s[k], rtol=2e-4, atol=2e-4,
                                       err_msg=f"ep{ep} {k} vs single")


def test_local_batch_slice_single_process():
    from onpolicy_tpu.parallel import distributed
    sl = distributed.local_batch_slice(32)
    assert sl == slice(0, 32)


def test_global_mesh_shape_preserves_model_axis():
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.parallel import distributed
    import jax
    n = jax.device_count()
    cfg = config_from_args([], env_name="MPE", scenario_name="simple_spread",
                           num_agents=3, mesh_shape=(1, 2))
    assert distributed.global_mesh_shape(cfg) == (n // 2, 2)
    assert distributed.global_mesh_shape() == (n,)


# ---------------------------------------------------------------------------
# host-ingestion runner multi-host (round-4: runner/host_mesh.py)
# ---------------------------------------------------------------------------

HOST_WORKER = r"""
import functools, json, os, sys
import jax
jax.config.update('jax_platforms', 'cpu')
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import numpy as np
pid = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
from onpolicy_tpu.parallel import distributed
distributed.initialize(coordinator_address="127.0.0.1:" + port,
                       num_processes=2, process_id=pid)
assert jax.device_count() == 8

from onpolicy_tpu.config import config_from_args
from onpolicy_tpu.envs.host_vec import DummyVecEnv
from onpolicy_tpu.runner.host_runner import HostSharedRunner
from tests.test_host_vec import MockSmacEnv

class SeededEnv(MockSmacEnv):
    # obs depend on the GLOBAL env id so misplaced rows break equality
    def _out(self):
        obs, state, avail = super()._out()
        return obs + self.seed_val * 0.1, state + self.seed_val * 0.1, avail

cfg = config_from_args([
    "--algorithm_name", "rmappo", "--episode_length", "6",
    "--n_rollout_threads", "4", "--num_env_steps", "96",
    "--ppo_epoch", "2", "--hidden_size", "32",
    "--data_chunk_length", "3", "--use_eval", "false",
    "--mesh_shape", "8", "--seed", "7"])
env = DummyVecEnv([lambda s=pid * 4 + i: SeededEnv(s) for i in range(4)],
                  protocol="share")
runner = HostSharedRunner(cfg, env)
# deterministic actions: identical trajectories regardless of process
# batch layout, so a single-process 8-env run is the exact oracle
runner._act_fn = jax.jit(functools.partial(runner.algo.get_actions,
                                           deterministic=True))
key = jax.random.PRNGKey(0)
key, k0 = jax.random.split(key)
ts, start = runner.init(k0)
rows = []
for _ in range(3):
    key, k = jax.random.split(key)
    ts, start, m = runner.run_episode(ts, start, k)
    rows.append({k2: float(m[k2]) for k2 in
                 ("value_loss", "policy_loss", "dist_entropy", "ratio")})
env.close()
with open(out_path, "w") as f:
    json.dump(rows, f)
"""


@pytest.mark.slow
def test_host_runner_two_process_matches_single(tmp_path):
    """The host-ingestion data plane across 2 processes: each owns its
    local env pool, contributes rows via make_array_from_process_local_
    data (host_mesh.put_batched), and the psum-reduced train metrics
    must equal a single-process run over the same 8 global envs."""
    port = str(_free_port())
    script = tmp_path / "host_worker.py"
    script.write_text(HOST_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    outs = [str(tmp_path / f"hm_{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port, outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), \
        "worker failed:\n" + "\n----\n".join(logs)

    # single-process oracle: all 8 envs in one pool, same seeds/keys
    import functools
    import jax
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.envs.host_vec import DummyVecEnv
    from onpolicy_tpu.runner.host_runner import HostSharedRunner
    from tests.test_host_vec import MockSmacEnv

    class SeededEnv(MockSmacEnv):
        def _out(self):
            obs, state, avail = super()._out()
            return (obs + self.seed_val * 0.1, state + self.seed_val * 0.1,
                    avail)

    cfg = config_from_args([
        "--algorithm_name", "rmappo", "--episode_length", "6",
        "--n_rollout_threads", "8", "--num_env_steps", "192",
        "--ppo_epoch", "2", "--hidden_size", "32",
        "--data_chunk_length", "3", "--use_eval", "false",
        "--mesh_shape", "8", "--seed", "7"])
    envp = DummyVecEnv([lambda s=i: SeededEnv(s) for i in range(8)],
                       protocol="share")
    try:
        runner = HostSharedRunner(cfg, envp)
        runner._act_fn = jax.jit(functools.partial(
            runner.algo.get_actions, deterministic=True))
        key = jax.random.PRNGKey(0)
        key, k0 = jax.random.split(key)
        ts, start = runner.init(k0)
        single = []
        for _ in range(3):
            key, k = jax.random.split(key)
            ts, start, m = runner.run_episode(ts, start, k)
            single.append({k2: float(m[k2]) for k2 in
                           ("value_loss", "policy_loss", "dist_entropy",
                            "ratio")})
    finally:
        envp.close()

    rows0 = json.load(open(outs[0]))
    rows1 = json.load(open(outs[1]))
    for ep, (a, b, s) in enumerate(zip(rows0, rows1, single)):
        for k in s:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-6,
                                       err_msg=f"ep{ep} {k} worker mismatch")
            np.testing.assert_allclose(a[k], s[k], rtol=2e-4, atol=2e-4,
                                       err_msg=f"ep{ep} {k} vs single")
