"""StackedFrames wrapper tests."""
import numpy as np

from onpolicy_tpu.envs.wrappers import StackedFrames
from tests.test_host_vec import MockSmacEnv


def test_stacking_reference_roll_layout():
    """Reference layout (`StarCraft2_Env.py:605-613`): every push is
    roll(+1) + write newest at [-1] ⇒ flattened
    [f_{t-1} | f_{t-2} | ... | f_t], zero-init once, reset() also
    pushes."""
    env = StackedFrames(MockSmacEnv(), k=3)
    obs, share, avail = env.reset()          # buf [0, 0, o0]
    assert obs.shape == (3, 8 * 3)
    np.testing.assert_array_equal(obs[:, :16], 0)
    a = np.zeros((3, 1))
    obs, share, rew, dones, infos, avail = env.step(a)   # [o0, 0, o1]
    assert (obs[:, -8:] == 1).all()
    assert (obs[:, :8] == 0).all() and (obs[:, 8:16] == 0).all()
    obs, *_ = env.step(a)                    # [o1, o0, o2]
    assert (obs[:, -8:] == 2).all()
    assert (obs[:, :8] == 1).all() and (obs[:, 8:16] == 0).all()
    obs, *_ = env.step(a)                    # [o2, o1, o3]
    assert (obs[:, -8:] == 3).all()
    assert (obs[:, :8] == 2).all() and (obs[:, 8:16] == 1).all()
    assert env.observation_space[0].shape == (24,)
    # episode boundary: buffers are NOT cleared (reference quirk) —
    # a reset rolls the old frames and appends the fresh obs
    obs, share, avail = env.reset()          # [o3, o2, o_reset]
    assert (obs[:, :8] == 3).all() and (obs[:, 8:16] == 2).all()
    assert (obs[:, -8:] == 0).all()          # MockSmacEnv resets t=0
    env.close()


def test_train_smac_wires_stacked_frames(monkeypatch):
    """--use_stacked_frames wraps each SMAC env thunk (reference consumes
    the flag inside StarCraft2_Env.py:325-327)."""
    from types import SimpleNamespace
    import numpy as np
    from onpolicy_tpu.envs import wrappers
    from onpolicy_tpu.scripts import train_smac
    from onpolicy_tpu.utils import spaces as sp

    class FakeSMAC:
        def __init__(self, *a, **kw):
            self.num_agents = 2
            self.observation_space = [sp.Box((4,))] * 2
            self.share_observation_space = [sp.Box((6,))] * 2
            self.action_space = [sp.Discrete(5)] * 2

        def reset(self):
            z = np.zeros((2, 4), np.float32)
            return z, np.zeros((2, 6), np.float32), np.ones((2, 5), np.float32)

    monkeypatch.setattr("onpolicy_tpu.envs.starcraft2.smac_env.SMACEnv",
                        FakeSMAC)
    ns = SimpleNamespace(env_name="StarCraft2", map_name="3m", units="5v5",
                         use_state_agent=True, add_center_xy=True,
                         use_mustalive=True, add_move_state=False,
                         add_local_obs=False, add_distance_state=False,
                         add_xy_state=False, add_visible_state=False,
                         add_enemy_action_state=False, add_agent_id=False)
    cfg = SimpleNamespace(use_stacked_frames=True, stacked_frames=3,
                          use_obs_instead_of_state=False)
    fns = train_smac.make_env_fns(ns, cfg, 2, base_seed=1)
    env = fns[0]()
    assert isinstance(env, wrappers.StackedFrames)
    obs, share, avail = env.reset()
    assert obs.shape == (2, 12) and share.shape == (2, 18)

    cfg2 = SimpleNamespace(use_stacked_frames=False, stacked_frames=1,
                           use_obs_instead_of_state=False)
    env2 = train_smac.make_env_fns(ns, cfg2, 1, base_seed=1)[0]()
    assert isinstance(env2, FakeSMAC)
