"""Every launch script under scripts/ must parse against its entry point.

The reference ships 50 .sh launchers pinning per-task hyperparameters
(`/root/reference/onpolicy/scripts/**/*.sh`); ours mirror their
EFFECTIVE configs (the reference's bool flags are store_true/store_false
toggles — e.g. `--use_value_active_masks` there means False — which our
scripts spell explicitly as `--flag false`). This test dry-parses each
script's flag list through the owning entry point so script/CLI drift
fails CI instead of failing users.
"""
import glob
import importlib
import re
import shlex

import pytest

from onpolicy_tpu.config import Config, canonicalize_algorithm, config_from_args

SCRIPTS = sorted(p for p in glob.glob("scripts/**/*.sh", recursive=True)
                 # supervise_train.sh is the fault-tolerance wrapper,
                 # not a train launcher with parseable flags
                 if not p.endswith("supervise_train.sh"))


def _extract(path):
    text = open(path).read().replace("\\\n", " ")
    m = re.search(r"python -m (\S+)([^\n]*)", text)
    assert m, f"{path}: no `python -m` invocation found"
    argv = shlex.split(m.group(2))
    argv = [a.replace("${MODEL_DIR:?set MODEL_DIR to a run dir}", "/tmp/m")
            for a in argv]
    argv = [re.sub(r"\$\{\w+[^}]*\}", "1", a) for a in argv]
    return m.group(1), argv


def test_scripts_found():
    assert len(SCRIPTS) >= 50, SCRIPTS


@pytest.mark.parametrize("path", SCRIPTS)
def test_script_parses(path):
    mod_name, argv = _extract(path)
    mod = importlib.import_module(mod_name)
    if hasattr(mod, "parse_args"):
        ns = mod.parse_args(argv)
        overrides = {k: v for k, v in vars(ns).items()
                     if k in Config.__dataclass_fields__ and v is not None}
        canonicalize_algorithm(Config(**overrides))
    else:
        # train_mpe / render_mpe parse purely through the shared config
        cfg = config_from_args(argv)
        assert cfg.env_name == "MPE"
