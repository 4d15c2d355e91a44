"""SMACv2 capability-distribution tests (pure host logic — no SC2)."""
import numpy as np
import pytest

from onpolicy_tpu.envs.starcraft2 import distributions as D
from onpolicy_tpu.envs.starcraft2.smac_maps import get_map_params


def rng():
    return np.random.default_rng(0)


def test_fixed_sequential_and_random():
    cfg = {"env_key": "team", "test_mode": True,
           "items": [["a", "b"], ["c", "d"], ["e", "f"]]}
    d = D.FixedDistribution(cfg, rng())
    ids = [d.generate()["team"]["id"] for _ in range(6)]
    assert ids == [0, 1, 2, 0, 1, 2]
    d2 = D.FixedDistribution(dict(cfg, test_mode=False), rng())
    out = d2.generate()["team"]
    assert sorted(out["item"]) in [sorted(x) for x in cfg["items"]]


def test_weighted_teams_properties():
    cfg = {"env_key": "team_gen", "unit_types": ["stalker", "zealot",
                                                 "colossus"],
           "weights": [0.45, 0.45, 0.1], "n_units": 5, "n_enemies": 7,
           "exception_unit_types": ["colossus"]}
    d = D.WeightedTeamsDistribution(cfg, rng())
    for _ in range(20):
        out = d.generate()["team_gen"]
        assert len(out["ally_team"]) == 5
        assert len(out["enemy_team"]) == 7
        # enemy contains the ally team as a sub-multiset
        assert sorted(out["enemy_team"][:5]) == sorted(out["ally_team"])
        # never all-exception
        assert not all(u == "colossus" for u in out["ally_team"])


def test_reflect_positions_mirror():
    cfg = {"env_key": "x", "n_units": 4, "n_enemies": 6,
           "map_x": 32, "map_y": 32}
    d = D.ReflectPositionDistribution(cfg, rng())
    out = d.generate()
    ally = out["ally_start_positions"]["item"]
    enemy = out["enemy_start_positions"]["item"]
    assert (ally[:, 0] <= 15).all()          # left half with buffer
    np.testing.assert_allclose(enemy[:4, 0], 32 - ally[:, 0])
    np.testing.assert_allclose(enemy[:4, 1], ally[:, 1])
    assert (enemy[4:, 0] >= 16).all()        # extras on the right half


def test_surrounded_groups_cover_all_enemies():
    cfg = {"n_units": 5, "n_enemies": 8, "map_x": 32, "map_y": 32}
    d = D.SurroundedPositionDistribution(cfg, rng())
    for _ in range(10):
        out = d.generate()
        ally = out["ally_start_positions"]["item"]
        enemy = out["enemy_start_positions"]["item"]
        np.testing.assert_allclose(ally, np.tile([16, 16], (5, 1)))
        assert enemy.shape == (8, 2)
        assert np.isfinite(enemy).all()


def test_surrounded_and_reflect_mixes():
    cfg = {"env_key": "x", "n_units": 4, "n_enemies": 4,
           "map_x": 32, "map_y": 32, "p": 0.5}
    d = D.SurroundedAndReflectPositionDistribution(cfg, rng())
    center = 0
    for _ in range(30):
        out = d.generate()
        ally = out["ally_start_positions"]["item"]
        if np.allclose(ally, 16):
            center += 1
    assert 0 < center < 30   # both modes appear


def test_parse_smacv2_distribution():
    from types import SimpleNamespace
    for race, unit in [("protoss", "stalker"), ("zerg", "zergling"),
                       ("terran", "marine")]:
        args = SimpleNamespace(units="10v11", map_name=f"10gen_{race}")
        cfg = D.parse_smacv2_distribution(args)
        assert cfg["n_units"] == 10 and cfg["n_enemies"] == 11
        assert unit in cfg["team_gen"]["unit_types"]
        assert cfg["start_positions"]["dist_type"] == "surrounded_and_reflect"


def test_map_registry():
    p = get_map_params("3s5z")
    assert p["n_agents"] == 8 and p["limit"] == 150
    with pytest.raises(KeyError):
        get_map_params("nope")
