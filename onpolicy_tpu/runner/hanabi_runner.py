"""Turn-based Hanabi runner (shared policy).

Re-derivation of `/root/reference/onpolicy/runner/shared/
hanabi_runner_forward.py`: one buffer step = one full seat round; per
seat, only envs with available actions act (the rest no-op with −1);
rewards accrue to a seat from the moment it acts until its next action
(`turn_rewards_since_last_action`, :175-201); envs finishing mid-round
zero the remaining seats' staging and mark a masked reset; buffer writes
use choose-insert slotting (obs at t, masks at t+1) and TRAINING IS
DEFERRED one buffer step — at step 0 of the next episode the tail slot
is patched with the fresh round, rewards shift one step, and the jitted
GAE+PPO update runs (:52-67).

Policy inference always runs on the full [N] batch (static shapes — the
reference slices `choose` rows, which would retrigger XLA compilation
per distinct count); non-chosen rows are discarded.

The env is the batched native engine (`HanabiVecEnv`) — one FFI call per
seat for the whole fleet, no subprocesses.
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from onpolicy_tpu import buffer as buf_lib
from onpolicy_tpu.algorithms.mappo import MAPPO
from onpolicy_tpu.envs.hanabi.hanabi_env import HanabiVecEnv
from onpolicy_tpu.utils import checkpoint as ckpt_lib
from onpolicy_tpu.utils import spaces as sp


class HanabiRunner:
    def __init__(self, cfg, vec_env: Optional[HanabiVecEnv] = None,
                 eval_env: Optional[HanabiVecEnv] = None):
        cfg = cfg.validate()
        self.cfg = cfg
        name = (cfg.scenario_name if cfg.scenario_name.startswith("Hanabi")
                else "Hanabi-Small")
        if vec_env is not None:
            self.envs = vec_env
        elif cfg.use_jax_env:
            # device-resident fleet (pure-JAX engine, zero host callbacks
            # in the scan-of-rounds episode)
            from onpolicy_tpu.envs.hanabi.jax_fleet import JaxHanabiFleet
            self.envs = JaxHanabiFleet(
                name, cfg.num_agents, cfg.n_rollout_threads, seed=cfg.seed,
                use_obs_instead_of_state=cfg.use_obs_instead_of_state)
        else:
            self.envs = HanabiVecEnv(
                name, cfg.num_agents, cfg.n_rollout_threads, seed=cfg.seed,
                use_obs_instead_of_state=cfg.use_obs_instead_of_state)
        self._pure_env = hasattr(self.envs, "pure_step")
        self.eval_envs = eval_env
        self.num_agents = M = self.envs.num_agents
        self.N = self.envs.n_envs
        obs_space = self.envs.observation_space[0]
        share_space = self.envs.share_observation_space[0] \
            if cfg.use_centralized_V else obs_space
        self.act_space = self.envs.action_space[0]
        self.episodes = int(cfg.num_env_steps) // cfg.episode_length // self.N
        self.algo = MAPPO(cfg, obs_space, share_space, self.act_space,
                          total_updates=self.episodes)
        # Collection splits actor and critic: the actor must run per
        # seat (its action feeds the next seat's observation), but the
        # value head feeds nothing inside the round — so the critic is
        # DEFERRED to one batched [N·M] pass per round (half the
        # sequential network stacks, 2× the critic matmul batch; the
        # round-3 profile named this lever, docs/PROFILE_HANABI.md).
        # NOTE: read at FIRST TRACE of _actor_fn/_device_round — set it
        # before any collection call; the property setter enforces this
        # (a post-trace toggle would be a silent no-op: the jitted
        # trace baked the value in). Tests set it right after
        # construction.
        self.__det_collect = False    # tests force deterministic actions
        self._collect_traced = False  # flipped at first _actor_step trace
        self._actor_fn = jax.jit(self._actor_step)
        self._critic_fn = jax.jit(self._critic_batch)
        self._act_det = jax.jit(lambda st, o, r, m, k, av: self.algo.act(
            st, o, r, m, k, av, deterministic=True))
        self._train_fn = jax.jit(self._compute_and_train)
        self.true_total_num_steps = 0

    @property
    def _det_collect(self) -> bool:
        return self.__det_collect

    @_det_collect.setter
    def _det_collect(self, value: bool):
        if self._collect_traced and value != self.__det_collect:
            raise RuntimeError(
                "_det_collect is baked into the jitted collection trace; "
                "set it before the first collection call")
        self.__det_collect = value

    def _actor_step(self, train_state, obs, rnn, masks, key, avail):
        """Actor-only seat step (critic deferred — see _host_round /
        _device_round tail). The side effect below runs at TRACE time,
        recording that _det_collect is now frozen."""
        self._collect_traced = True
        return self.algo.actor.forward(
            train_state.actor_params, obs, rnn, masks, key, avail,
            self.__det_collect)

    def _critic_batch(self, train_state, share, rnn_c, masks):
        return self.algo.critic.forward(train_state.critic_params, share,
                                        rnn_c, masks)

    # ------------------------------------------------------------------
    def _alloc_buffer(self):
        cfg, N, M, T = self.cfg, self.N, self.num_agents, \
            self.cfg.episode_length
        Do = self.envs.obs_dim
        Ds = self.envs.share_dim if cfg.use_centralized_V else Do
        A = self.envs.n_moves
        L, H = cfg.recurrent_N, cfg.hidden_size
        z = lambda *s: np.zeros(s, np.float32)
        return {
            "share_obs": z(T + 1, N, M, Ds), "obs": z(T + 1, N, M, Do),
            "rnn_states": z(T + 1, N, M, L, H),
            "rnn_states_critic": z(T + 1, N, M, L, H),
            "actions": z(T, N, M, 1), "action_log_probs": z(T, N, M, 1),
            "value_preds": z(T + 1, N, M, 1), "rewards": z(T, N, M, 1),
            "masks": np.ones((T + 1, N, M, 1), np.float32),
            "bad_masks": np.ones((T + 1, N, M, 1), np.float32),
            "active_masks": np.ones((T + 1, N, M, 1), np.float32),
            "available_actions": np.ones((T + 1, N, M, A), np.float32),
        }

    def _compute_and_train(self, train_state, buf, key):
        cfg = self.cfg
        BA = self.N * self.num_agents
        next_values = self.algo.get_values(
            train_state, buf.share_obs[-1].reshape(BA, -1),
            buf.rnn_states_critic[-1].reshape(BA, cfg.recurrent_N, -1),
            buf.masks[-1].reshape(BA, 1)).reshape(self.N, self.num_agents, 1)
        buf = buf.compute_returns(
            next_values, train_state.vnorm, gamma=cfg.gamma,
            gae_lambda=cfg.gae_lambda, use_gae=cfg.use_gae,
            use_proper_time_limits=cfg.use_proper_time_limits)
        return self.algo.train(train_state, buf, key)

    def _train_from_numpy(self, train_state, bufnp, key):
        buf = buf_lib.RolloutBuffer(
            **{k: jnp.asarray(v) for k, v in bufnp.items()})
        return self._train_fn(train_state, buf, key)

    # ------------------------------------------------------------------
    # host-loop seat round (one jitted policy dispatch per seat)
    def _host_round(self, train_state, turn, use, key):
        """One full seat round, mutating `turn` staging and `use`
        obs/share/avail numpy arrays in place. Returns
        (key, reset_choose [N] bool, finished-game scores list)."""
        cfg, N, M = self.cfg, self.N, self.num_agents
        reset_choose = np.zeros(N, bool)
        done_this_round = np.zeros(N, bool)
        chose = np.zeros((N, M), bool)
        # seat at which each env died this round (M = survived): the
        # future-seat zero set must cover seats the loop never VISITS
        # (early break when no env has actions left), exactly like the
        # old at-death `turn["values"][nd, seat+1:] = 0` did
        done_at = np.full(N, M, np.int32)
        # round-start critic state/masks: for every (env, seat) slot the
        # sequential path would act on, these equal what its per-seat
        # critic call consumed (done-gating only touches non-chosen rows)
        rnn_c0 = turn["rnn_critic"].copy()
        masks0 = turn["masks"].copy()
        ep_scores = []
        for seat in range(M):
            env_actions = np.full(N, -1, np.int64)
            choose = np.any(use["avail"] == 1, axis=1)
            if not choose.any():
                reset_choose[:] = True
                break
            key, k_act = jax.random.split(key)
            actions, logp, rnn = self._actor_fn(
                train_state, use["obs"], turn["rnn"][:, seat],
                turn["masks"][:, seat], k_act, use["avail"])
            actions, logp, rnn = map(np.asarray, (actions, logp, rnn))
            chose[:, seat] = choose

            turn["obs"][choose, seat] = use["obs"][choose]
            turn["share_obs"][choose, seat] = use["share"][choose]
            turn["avail"][choose, seat] = use["avail"][choose]
            turn["actions"][choose, seat] = actions[choose]
            turn["logp"][choose, seat] = logp[choose]
            turn["rnn"][choose, seat] = rnn[choose]
            env_actions[choose] = actions[choose, 0].astype(np.int64)

            obs, share_obs, rewards, done, cur, avail, score = \
                self.envs.step(env_actions)
            if not cfg.use_centralized_V:
                share_obs = obs
            self.true_total_num_steps += int(choose.sum())
            use["obs"], use["share"], use["avail"] = obs, share_obs, avail

            # reward accrual since each seat's last action
            turn["rewards"][choose, seat] = turn["accum"][choose, seat]
            turn["accum"][choose, seat] = 0.0
            turn["accum"][choose] += rewards[choose]

            newly_done = done & choose
            if newly_done.any():
                nd = newly_done
                reset_choose[nd] = True
                done_this_round[nd] = True
                done_at[nd] = seat
                use["avail"][nd] = 0.0
                turn["masks"][nd] = 0.0
                turn["rnn"][nd] = 0.0
                turn["active"][nd, seat] = 1.0
                if seat + 1 < M:
                    turn["active"][nd, seat + 1:] = 0.0
                    turn["rewards"][nd, seat + 1:] = \
                        turn["accum"][nd, seat + 1:]
                    turn["accum"][nd, seat + 1:] = 0.0
                    turn["obs"][nd, seat + 1:] = 0.0
                    turn["share_obs"][nd, seat + 1:] = 0.0
                ep_scores.extend(score[nd].tolist())
            not_done = (~done) & choose
            turn["masks"][not_done, seat] = 1.0
            turn["active"][not_done, seat] = 1.0

        # deferred batched critic: ONE [N·M] pass over the staged
        # share_obs instead of one [N] pass per seat — values feed only
        # the buffer, never the round, so this is semantics-preserving
        BA = N * M
        v_all, rnn_c_all = self._critic_fn(
            train_state, turn["share_obs"].reshape(BA, -1),
            rnn_c0.reshape(BA, *rnn_c0.shape[2:]),
            masks0.reshape(BA, 1))
        v_all = np.asarray(v_all).reshape(N, M, 1)
        rnn_c_all = np.asarray(rnn_c_all).reshape(N, M,
                                                  *rnn_c0.shape[2:])
        zeroed = done_at[:, None] < np.arange(M)[None, :]
        turn["values"][zeroed] = 0.0
        w = chose & ~zeroed
        turn["values"][w] = v_all[w]
        turn["rnn_critic"][chose] = rnn_c_all[chose]
        turn["rnn_critic"][done_this_round] = 0.0
        return key, reset_choose, ep_scores

    # ------------------------------------------------------------------
    # device-collect path: the whole seat round (policy + staging math +
    # env stepping via ordered io_callback) is ONE jitted program —
    # 1 dispatch per buffer step instead of one per seat, and the
    # turn-staging bookkeeping runs on device. Masked resets happen
    # inside the round; `masks_insert` snapshots the pre-reset masks the
    # buffer slotting needs. Exactly equivalent to _host_round
    # (tests/test_hanabi_device_collect.py drives both bit-for-bit).
    def _env_step_cb(self, env_actions):
        obs, share, rewards, done, cur, avail, score = self.envs.step(
            np.asarray(env_actions, np.int64))
        if not self.cfg.use_centralized_V:
            share = obs
        return (obs.astype(np.float32), share.astype(np.float32),
                rewards.astype(np.float32), np.asarray(done, np.bool_),
                avail.astype(np.float32), np.asarray(score, np.float32))

    def _env_reset_cb(self, reset_choose):
        mask = np.asarray(reset_choose)
        if mask.any():
            obs, share, avail, _ = self.envs.reset(mask)
            if not self.cfg.use_centralized_V:
                share = obs
            return (obs.astype(np.float32), share.astype(np.float32),
                    avail.astype(np.float32))
        N = self.N
        Do = self.envs.obs_dim
        Ds = self.envs.share_dim if self.cfg.use_centralized_V else Do
        return (np.zeros((N, Do), np.float32),
                np.zeros((N, Ds), np.float32),
                np.zeros((N, self.envs.n_moves), np.float32))

    def _init_device_carry(self, use_obs, use_share, use_avail, turn):
        j = jnp.asarray
        c = {
            "use_obs": j(use_obs), "use_share": j(use_share),
            "use_avail": j(use_avail),
            **{k: j(v) for k, v in turn.items()},
        }
        if self._pure_env:
            c["env_states"] = self.envs._states   # device pytree
        return c

    def _device_round(self, train_state, carry, key):
        from jax.experimental import io_callback
        cfg, N, M = self.cfg, self.N, self.num_agents
        Do = self.envs.obs_dim
        Ds = self.envs.share_dim if cfg.use_centralized_V else Do
        A = self.envs.n_moves
        f32 = jnp.float32
        step_shapes = (jax.ShapeDtypeStruct((N, Do), f32),
                       jax.ShapeDtypeStruct((N, Ds), f32),
                       jax.ShapeDtypeStruct((N, M, 1), f32),
                       jax.ShapeDtypeStruct((N,), jnp.bool_),
                       jax.ShapeDtypeStruct((N, A), f32),
                       jax.ShapeDtypeStruct((N,), f32))
        reset_shapes = (jax.ShapeDtypeStruct((N, Do), f32),
                        jax.ShapeDtypeStruct((N, Ds), f32),
                        jax.ShapeDtypeStruct((N, A), f32))

        c = dict(carry)
        reset_choose = jnp.zeros((N,), bool)
        done_this_round = jnp.zeros((N,), bool)
        score_sum = jnp.zeros((), f32)
        score_n = jnp.zeros((), jnp.int32)
        true_delta = jnp.zeros((), jnp.int32)
        chose_l, zero_l = [], []
        # round-start critic state/masks for the deferred batched pass
        rnn_c0 = c["rnn_critic"]
        masks0 = c["masks"]

        for seat in range(M):
            choose = jnp.any(c["use_avail"] == 1, axis=1)       # [N]
            c1 = choose[:, None]
            c2 = choose[:, None, None]
            key, k_act = jax.random.split(key)
            actions, logp, rnn = self._actor_step(
                train_state, c["use_obs"], c["rnn"][:, seat],
                c["masks"][:, seat], k_act, c["use_avail"])
            chose_l.append(choose)
            zero_l.append(done_this_round)

            upd = lambda name, new, cm: c.__setitem__(
                name, c[name].at[:, seat].set(
                    jnp.where(cm, new, c[name][:, seat])))
            upd("obs", c["use_obs"], c1)
            upd("share_obs", c["use_share"], c1)
            upd("avail", c["use_avail"], c1)
            upd("actions", actions, c1)
            upd("logp", logp, c1)
            upd("rnn", rnn, c2)
            env_actions = jnp.where(
                choose, actions[:, 0].astype(jnp.int64), -1)

            if self._pure_env:
                (c["env_states"], obs, share, rewards, done, avail,
                 score) = self.envs.pure_step(c["env_states"], env_actions)
                if not cfg.use_centralized_V:
                    share = obs
            else:
                obs, share, rewards, done, avail, score = io_callback(
                    self._env_step_cb, step_shapes, env_actions,
                    ordered=True)
            true_delta = true_delta + jnp.sum(choose.astype(jnp.int32))
            c["use_obs"], c["use_share"], c["use_avail"] = obs, share, avail

            # reward accrual since each seat's last action
            upd("rewards", c["accum"][:, seat], c1)
            c["accum"] = c["accum"].at[:, seat].set(
                jnp.where(c1, 0.0, c["accum"][:, seat]))
            c["accum"] = c["accum"] + jnp.where(c2, rewards, 0.0)

            nd = done & choose
            nd1 = nd[:, None]
            nd2 = nd[:, None, None]
            reset_choose = reset_choose | nd
            done_this_round = done_this_round | nd
            c["use_avail"] = jnp.where(nd1, 0.0, c["use_avail"])
            c["masks"] = jnp.where(nd2, 0.0, c["masks"])
            c["rnn"] = jnp.where(nd[:, None, None, None], 0.0, c["rnn"])
            c["active"] = c["active"].at[:, seat].set(
                jnp.where(nd1, 1.0, c["active"][:, seat]))
            if seat + 1 < M:
                fut = slice(seat + 1, M)
                setf = lambda name, new: c.__setitem__(
                    name, c[name].at[:, fut].set(
                        jnp.where(nd2, new, c[name][:, fut])))
                setf("active", 0.0)
                setf("rewards", c["accum"][:, fut])
                setf("accum", 0.0)
                setf("obs", 0.0)
                setf("share_obs", 0.0)
            score_sum = score_sum + jnp.sum(jnp.where(nd, score, 0.0))
            score_n = score_n + jnp.sum(nd.astype(jnp.int32))
            ndn = (~done) & choose
            c["masks"] = c["masks"].at[:, seat].set(
                jnp.where(ndn[:, None], 1.0, c["masks"][:, seat]))
            c["active"] = c["active"].at[:, seat].set(
                jnp.where(ndn[:, None], 1.0, c["active"][:, seat]))

        # deferred batched critic (mirrors _host_round's tail): one
        # [N·M] pass over the staged share_obs; chosen slots take the
        # fresh value/state, future-seat slots blanked on done take 0,
        # everything else keeps its previous staging
        chose_m = jnp.stack(chose_l, axis=1)           # [N, M]
        zero_m = jnp.stack(zero_l, axis=1)
        BA = N * M
        v_all, rnn_c_all = self.algo.critic.forward(
            train_state.critic_params, c["share_obs"].reshape(BA, -1),
            rnn_c0.reshape(BA, *rnn_c0.shape[2:]),
            masks0.reshape(BA, 1))
        v_all = v_all.reshape(N, M, 1)
        rnn_c_all = rnn_c_all.reshape(N, M, *rnn_c0.shape[2:])
        c["values"] = jnp.where(
            zero_m[..., None], 0.0,
            jnp.where(chose_m[..., None], v_all, c["values"]))
        c["rnn_critic"] = jnp.where(
            done_this_round[:, None, None, None], 0.0,
            jnp.where(chose_m[:, :, None, None], rnn_c_all,
                      c["rnn_critic"]))

        # the buffer slots the PRE-reset masks at step t+1
        masks_insert = c["masks"]
        if self._pure_env:
            key, k_reset = jax.random.split(key)
            c["env_states"] = self.envs.masked_reset(
                c["env_states"], reset_choose, k_reset)
            fresh_obs, fresh_share, fresh_avail, _, _, _ = \
                self.envs.observe(c["env_states"])
            if not cfg.use_centralized_V:
                fresh_share = fresh_obs
        else:
            fresh_obs, fresh_share, fresh_avail = io_callback(
                self._env_reset_cb, reset_shapes, reset_choose, ordered=True)
        rc1 = reset_choose[:, None]
        c["use_obs"] = jnp.where(rc1, fresh_obs, c["use_obs"])
        c["use_share"] = jnp.where(rc1, fresh_share, c["use_share"])
        c["use_avail"] = jnp.where(rc1, fresh_avail, c["use_avail"])
        c["masks"] = jnp.where(reset_choose[:, None, None], 1.0, c["masks"])
        aux = {"key": key, "reset_choose": reset_choose,
               "masks_insert": masks_insert, "score_sum": score_sum,
               "score_n": score_n, "true_delta": true_delta}
        return c, aux

    # ------------------------------------------------------------------
    # scan-of-rounds: the WHOLE EPISODE (T seat rounds + deferred train +
    # choose-insert buffer writes) is one jitted program. The buffer
    # lives on device in `dbuf`; the host sees one dispatch per episode
    # instead of one per buffer step (the round-1 wall-clock bottleneck —
    # each dispatch pays the remote-TPU round trip). Equivalence with the
    # host loop: tests/test_hanabi_device_collect.py.
    def _write_slot(self, dbuf, step, c, masks_insert):
        up = lambda name, arr, idx, val: dbuf.__setitem__(
            name, arr.at[idx].set(val))
        up("share_obs", dbuf["share_obs"], step, c["share_obs"])
        up("obs", dbuf["obs"], step, c["obs"])
        up("rnn_states", dbuf["rnn_states"], step + 1, c["rnn"])
        up("rnn_states_critic", dbuf["rnn_states_critic"], step + 1,
           c["rnn_critic"])
        up("actions", dbuf["actions"], step, c["actions"])
        up("action_log_probs", dbuf["action_log_probs"], step, c["logp"])
        up("value_preds", dbuf["value_preds"], step, c["values"])
        up("rewards", dbuf["rewards"], step, c["rewards"])
        up("masks", dbuf["masks"], step + 1, masks_insert)
        up("active_masks", dbuf["active_masks"], step, c["active"])
        up("available_actions", dbuf["available_actions"], step, c["avail"])
        return dbuf

    def _device_episode(self, train_state, carry, dbuf, key, do_train):
        """One full episode on device. Returns (train_state, carry, dbuf,
        metrics) — metrics include train stats (when do_train) and the
        episode's score/true-step accumulators."""
        T = self.cfg.episode_length
        carry, aux = self._device_round(train_state, carry, key)
        key = aux["key"]
        score_sum = aux["score_sum"]
        score_n = aux["score_n"]
        true_delta = aux["true_delta"]

        metrics = {}
        if do_train:
            # deferred train (hanabi_runner_forward.py:52-67): patch the
            # PREVIOUS episode's tail slot with this fresh round, shift
            # rewards one step, then GAE + PPO
            dbuf = dict(dbuf)
            dbuf["share_obs"] = dbuf["share_obs"].at[-1].set(carry["share_obs"])
            dbuf["obs"] = dbuf["obs"].at[-1].set(carry["obs"])
            dbuf["available_actions"] = \
                dbuf["available_actions"].at[-1].set(carry["avail"])
            dbuf["active_masks"] = \
                dbuf["active_masks"].at[-1].set(carry["active"])
            shifted = jnp.concatenate(
                [dbuf["rewards"][1:], carry["rewards"][None]], axis=0)
            dbuf["rewards"] = shifted
            key, k_train = jax.random.split(key)
            buf = buf_lib.RolloutBuffer(**dbuf)
            train_state, metrics = self._compute_and_train(
                train_state, buf, k_train)
            metrics = dict(metrics)
            metrics["average_step_rewards"] = jnp.mean(dbuf["rewards"])

        dbuf = self._write_slot(dict(dbuf), 0, carry, aux["masks_insert"])

        def body(sc, _):
            carry, dbuf, key, acc = sc
            step, ssum, sn, td = acc
            carry, aux = self._device_round(train_state, carry, key)
            dbuf = self._write_slot(dict(dbuf), step, carry,
                                    aux["masks_insert"])
            acc = (step + 1, ssum + aux["score_sum"], sn + aux["score_n"],
                   td + aux["true_delta"])
            return (carry, dbuf, aux["key"], acc), None

        # serial key threading — identical split chain to the host loop
        (carry, dbuf, key, acc), _ = jax.lax.scan(
            body, (carry, dbuf, key,
                   (jnp.asarray(1), score_sum, score_n, true_delta)),
            None, length=T - 1)
        _, score_sum, score_n, true_delta = acc
        metrics["_score_sum"] = score_sum
        metrics["_score_n"] = score_n
        metrics["_true_delta"] = true_delta
        return train_state, carry, dbuf, key, metrics

    # ------------------------------------------------------------------
    def _fresh_staging(self, obs, share_obs, avail):
        """(use, turn) numpy staging dicts for a fresh fleet state."""
        N, M = self.N, self.num_agents
        L, H = self.cfg.recurrent_N, self.cfg.hidden_size
        use = {"obs": obs.copy(), "share": share_obs.copy(),
               "avail": avail.copy()}
        turn = {
            "obs": np.zeros((N, M, obs.shape[-1]), np.float32),
            "share_obs": np.zeros((N, M, share_obs.shape[-1]), np.float32),
            "avail": np.zeros((N, M, avail.shape[-1]), np.float32),
            "values": np.zeros((N, M, 1), np.float32),
            "actions": np.zeros((N, M, 1), np.float32),
            "logp": np.zeros((N, M, 1), np.float32),
            "rnn": np.zeros((N, M, L, H), np.float32),
            "rnn_critic": np.zeros((N, M, L, H), np.float32),
            "masks": np.ones((N, M, 1), np.float32),
            "active": np.ones((N, M, 1), np.float32),
            "rewards": np.zeros((N, M, 1), np.float32),
            "accum": np.zeros((N, M, 1), np.float32),
        }
        return use, turn

    def init_device(self, key):
        """(train_state, carry, dbuf) for the scan-of-rounds episode
        program — the device-resident state triple `_device_episode`
        consumes (used by __graft_entry__.dryrun_multichip and tests to
        drive the flagship program directly)."""
        obs, share_obs, avail, cur = self.envs.reset()
        if not self.cfg.use_centralized_V:
            share_obs = obs
        use, turn = self._fresh_staging(obs, share_obs, avail)
        train_state = self.algo.init_state(jax.random.fold_in(key, 0))
        carry = self._init_device_carry(use["obs"], use["share"],
                                        use["avail"], turn)
        dbuf = {k: jnp.asarray(v) for k, v in self._alloc_buffer().items()}
        return train_state, carry, dbuf

    # ------------------------------------------------------------------
    def run(self, key=None, log_fn=print, save_dir=None):
        cfg = self.cfg
        N, M, T = self.N, self.num_agents, cfg.episode_length
        L, H = cfg.recurrent_N, cfg.hidden_size
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)

        obs, share_obs, avail, cur = self.envs.reset()
        if not cfg.use_centralized_V:
            share_obs = obs
        use, turn = self._fresh_staging(obs, share_obs, avail)
        bufnp = self._alloc_buffer()
        train_state = self.algo.init_state(jax.random.fold_in(key, 0))
        # resume (weights + opt + normalizer + RNG + episode counter) —
        # the shared/separated runners' model_dir semantics
        start_episode = 0
        if cfg.model_dir:
            restored, step, rkey = ckpt_lib.restore(cfg.model_dir,
                                                    train_state)
            train_state = jax.tree_util.tree_map(jnp.asarray, restored)
            if step:
                start_episode = int(step) + 1
            if rkey is not None:
                key = rkey
            meta = ckpt_lib.load_metadata(cfg.model_dir)
            if meta:  # true-step accounting continues across resumes
                self.true_total_num_steps = int(
                    meta.get("true_total_num_steps", 0))
        scores = []
        history = []
        metrics = {}
        start = time.perf_counter()

        scan_rounds = cfg.use_scan_rounds
        device = cfg.use_device_collect or scan_rounds
        if device:
            carry = self._init_device_carry(use["obs"], use["share"],
                                            use["avail"], turn)
            round_jit = jax.jit(self._device_round)
            ep_score_sum, ep_score_n = 0.0, 0
        if scan_rounds:
            dbuf = {k: jnp.asarray(v) for k, v in bufnp.items()}
            ep_first = jax.jit(
                lambda ts, c, b, k: self._device_episode(ts, c, b, k, False))
            ep_train = jax.jit(
                lambda ts, c, b, k: self._device_episode(ts, c, b, k, True))
            for episode in range(start_episode, self.episodes):
                fn = ep_first if episode == start_episode else ep_train
                train_state, carry, dbuf, key, m = fn(
                    train_state, carry, dbuf, key)
                do_log = (episode % cfg.log_interval == 0 and episode > 0) \
                    or episode == self.episodes - 1
                # exact true-step accounting every episode (checkpoint
                # metadata must include the episode just finished)
                self.true_total_num_steps += int(
                    jax.device_get(m["_true_delta"]))
                if save_dir and (episode % max(cfg.save_interval, 1) == 0
                                 or episode == self.episodes - 1):
                    ckpt_lib.save(save_dir, train_state, step=episode,
                                  key=jax.device_get(key),
                                  metadata={"true_total_num_steps":
                                            self.true_total_num_steps})
                if cfg.use_eval and self.eval_envs is not None \
                        and episode % cfg.eval_interval == 0:
                    key, k_ev = jax.random.split(jax.device_get(key))
                    metrics["eval_average_score"] = self.evaluate(
                        train_state, cfg.eval_episodes, key=k_ev,
                        env=self.eval_envs)
                if do_log:
                    m = jax.device_get(m)
                    m.pop("_true_delta")   # already accumulated above
                    sn = int(m.pop("_score_n"))
                    avg = float(m.pop("_score_sum")) / max(sn, 1)
                    metrics.update({k: float(v) for k, v in m.items()})
                    steps_total = (episode + 1) * T * self.N
                    # fps counts only THIS process's work — after a
                    # model_dir resume the pre-resume episodes are not
                    # charged against the post-resume wall clock
                    steps_here = (episode - start_episode + 1) * T * self.N
                    row = {"episode": episode, "steps": steps_total,
                           "true_steps": self.true_total_num_steps,
                           "fps": steps_here
                           / (time.perf_counter() - start),
                           "average_score": avg, **metrics}
                    history.append(row)
                    if log_fn is print:
                        print(f"ep {episode} steps {steps_total} "
                              f"score {row['average_score']:.2f}")
                    elif log_fn is not None:
                        log_fn(row)
            return train_state, history

        for episode in range(start_episode, self.episodes):
            ep_scores = []
            if device:
                ep_score_sum, ep_score_n = 0.0, 0
            for step in range(T):
                # ---- one seat round (collect, :138-220) --------------
                if device:
                    carry, aux = round_jit(train_state, carry, key)
                    key = aux["key"]
                    host = jax.device_get(
                        {k: carry[k] for k in
                         ("obs", "share_obs", "avail", "values", "actions",
                          "logp", "rnn", "rnn_critic", "rewards", "active")}
                        | {"masks": aux["masks_insert"]})
                    turn.update(host)
                    self.true_total_num_steps += int(aux["true_delta"])
                    ep_score_sum += float(aux["score_sum"])
                    ep_score_n += int(aux["score_n"])
                    reset_choose = np.asarray(aux["reset_choose"])
                else:
                    key, reset_choose, sc = self._host_round(
                        train_state, turn, use, key)
                    ep_scores.extend(sc)

                # ---- deferred train (:52-67) -------------------------
                if step == 0 and episode > start_episode:
                    bufnp["share_obs"][-1] = turn["share_obs"]
                    bufnp["obs"][-1] = turn["obs"]
                    bufnp["available_actions"][-1] = turn["avail"]
                    bufnp["active_masks"][-1] = turn["active"]
                    bufnp["rewards"][:T - 1] = bufnp["rewards"][1:]
                    bufnp["rewards"][-1] = turn["rewards"]
                    key, k_train = jax.random.split(key)
                    train_state, m = self._train_from_numpy(
                        train_state, bufnp, k_train)
                    metrics = {k: float(v)
                               for k, v in jax.device_get(m).items()}
                    metrics["average_step_rewards"] = float(
                        np.mean(bufnp["rewards"]))

                # ---- choose-insert (shared_buffer.py:125-158) --------
                bufnp["share_obs"][step] = turn["share_obs"]
                bufnp["obs"][step] = turn["obs"]
                bufnp["rnn_states"][step + 1] = turn["rnn"]
                bufnp["rnn_states_critic"][step + 1] = turn["rnn_critic"]
                bufnp["actions"][step] = turn["actions"]
                bufnp["action_log_probs"][step] = turn["logp"]
                bufnp["value_preds"][step] = turn["values"]
                bufnp["rewards"][step] = turn["rewards"]
                bufnp["masks"][step + 1] = turn["masks"]
                bufnp["active_masks"][step] = turn["active"]
                bufnp["available_actions"][step] = turn["avail"]

                # ---- masked env reset (device path resets in-round) --
                if not device and reset_choose.any():
                    obs, share_obs, avail, cur = self.envs.reset(reset_choose)
                    if not cfg.use_centralized_V:
                        share_obs = obs
                    use["obs"][reset_choose] = obs[reset_choose]
                    use["share"][reset_choose] = share_obs[reset_choose]
                    use["avail"][reset_choose] = avail[reset_choose]
                    turn["masks"][reset_choose] = 1.0

            scores.extend(ep_scores)
            if device:
                ep_avg = ep_score_sum / max(ep_score_n, 1)
            if save_dir and (episode % max(cfg.save_interval, 1) == 0
                             or episode == self.episodes - 1):
                ckpt_lib.save(save_dir, train_state, step=episode, key=key,
                              metadata={"true_total_num_steps":
                                        self.true_total_num_steps})
            if cfg.use_eval and self.eval_envs is not None \
                    and episode % cfg.eval_interval == 0:
                key, k_ev = jax.random.split(key)
                metrics["eval_average_score"] = self.evaluate(
                    train_state, cfg.eval_episodes, key=k_ev,
                    env=self.eval_envs)
            if (episode % cfg.log_interval == 0 and episode > 0) \
                    or episode == self.episodes - 1:
                steps_total = (episode + 1) * T * self.N
                steps_here = (episode - start_episode + 1) * T * self.N
                row = {"episode": episode, "steps": steps_total,
                       "true_steps": self.true_total_num_steps,
                       "fps": steps_here / (time.perf_counter() - start),
                       "average_score": (ep_avg if device else
                                         float(np.mean(ep_scores))
                                         if ep_scores else 0.0), **metrics}
                history.append(row)
                if log_fn is print:
                    print(f"ep {episode} steps {steps_total} "
                          f"score {row['average_score']:.2f}")
                elif log_fn is not None:
                    log_fn(row)
        return train_state, history

    # ------------------------------------------------------------------
    def evaluate_device(self, train_state, n_games: int, key=None,
                        max_steps: Optional[int] = None) -> float:
        """Device-resident `eval_100k` (hanabi_runner_forward.py:281-329):
        generations of N one-shot deterministic games play entirely on
        device — one jitted lax.scan over seat steps per generation,
        finished games no-op (action −1) until the scan ends. The step
        bound is derived from the game config: every play/discard draws
        from the deck, hint streaks are bounded by info tokens, and the
        engine ends the game one full round after the deck empties, so
        2·deck + max_info + players + 8 covers any legal game."""
        cfg = self.cfg
        env = self.envs
        if not hasattr(env, "pure_step"):
            raise ValueError("evaluate_device requires --use_jax_env "
                             "(pure-JAX fleet)")
        N = env.n_envs
        g = env.game
        if max_steps is None:
            max_steps = 2 * g.deck_len + g.max_info + g.players + 8
        key = key if key is not None else jax.random.PRNGKey(cfg.seed + 5)
        L, H = cfg.recurrent_N, cfg.hidden_size

        def generation(ts, k):
            k_reset, k_act = jax.random.split(k)
            states = env.reset_states(k_reset)
            obs, _, avail, _, _, _ = env.observe(states)
            rnn = jnp.zeros((N, L, H), jnp.float32)
            masks = jnp.ones((N, 1), jnp.float32)

            def body(carry, kk):
                states, obs, avail, rnn = carry
                choose = jnp.any(avail == 1, axis=1)
                actions, rnn_out = self.algo.act(
                    ts, obs, rnn, masks, kk, avail, deterministic=True)
                env_actions = jnp.where(
                    choose, actions[:, 0].astype(jnp.int32), -1)
                states, obs, _, _, done, avail, _ = env.pure_step(
                    states, env_actions)
                rnn = jnp.where(done[:, None, None], 0.0, rnn_out)
                return (states, obs, avail, rnn), None

            keys = jax.random.split(k_act, max_steps)
            (states, _, _, _), _ = jax.lax.scan(
                body, (states, obs, avail, rnn), keys)
            _, _, _, _, done, scr = env.observe(states)
            return scr, done

        gen_jit = jax.jit(generation)
        scores: list = []
        while len(scores) < n_games:
            key, k = jax.random.split(key)
            scr, done = jax.device_get(gen_jit(train_state, k))
            scores.extend(scr[done].tolist())   # done is all-True by bound
        return float(np.mean(np.asarray(scores[:n_games], np.float64)))

    def evaluate(self, train_state, n_games: int, key=None,
                 env: Optional[HanabiVecEnv] = None):
        """Deterministic evaluation until `n_games` finish; returns mean
        score (`eval` / `eval_100k`, hanabi_runner_forward.py:228-329)."""
        cfg = self.cfg
        env = env or self.envs
        key = key if key is not None else jax.random.PRNGKey(cfg.seed + 5)
        N, M = env.n_envs, self.num_agents
        obs, share, avail, cur = env.reset()
        rnn = np.zeros((N, cfg.recurrent_N, cfg.hidden_size), np.float32)
        masks = np.ones((N, 1), np.float32)
        scores = []
        guard = 0
        while len(scores) < n_games and guard < 100000:
            guard += 1
            choose = np.any(avail == 1, axis=1)
            if not choose.any():
                obs, share, avail, cur = env.reset()
                rnn[:] = 0
                continue
            key, k = jax.random.split(key)
            actions, rnn_out = self._act_det(train_state, obs, rnn, masks, k,
                                             avail)
            actions = np.asarray(actions)
            rnn = np.array(rnn_out)  # writable copy (jax buffers are RO)
            env_actions = np.full(N, -1, np.int64)
            env_actions[choose] = actions[choose, 0].astype(np.int64)
            obs, share, rewards, done, cur, avail, score = env.step(
                env_actions)
            newly = done & choose
            if newly.any():
                scores.extend(score[newly].tolist())
                reset_mask = newly
                o2, s2, a2, _ = env.reset(reset_mask)
                obs[reset_mask] = o2[reset_mask]
                avail[reset_mask] = a2[reset_mask]
                rnn[reset_mask] = 0.0
        return float(np.mean(scores[:n_games])) if scores else 0.0
