"""StackedFrames wrapper tests."""
import numpy as np

from onpolicy_tpu.envs.wrappers import StackedFrames
from tests.test_host_vec import MockSmacEnv


def test_stacking_and_reset_padding():
    env = StackedFrames(MockSmacEnv(), k=3)
    obs, share, avail = env.reset()
    assert obs.shape == (3, 8 * 3)
    # first frames zero-padded; last slot is the t=0 obs (all zeros here)
    np.testing.assert_array_equal(obs[:, :16], 0)
    a = np.zeros((3, 1))
    obs, share, rew, dones, infos, avail = env.step(a)
    # last slot holds t=1 obs (value 1), middle t=0 (0), first pad (0)
    assert (obs[:, -8:] == 1).all()
    assert (obs[:, 8:16] == 0).all()
    obs, *_ = env.step(a)
    assert (obs[:, -8:] == 2).all()
    assert (obs[:, 8:16] == 1).all()
    assert env.observation_space[0].shape == (24,)
    env.close()
