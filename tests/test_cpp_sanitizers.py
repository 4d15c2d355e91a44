"""ASan+UBSan run of the native Hanabi engine test binary.

SURVEY §5.2: the reference ships no sanitizer targets; the TPU-era
equivalent for our only native component (cpp/hanabi) is an
AddressSanitizer + UndefinedBehaviorSanitizer build of the C++ test
suite, run here so memory/UB regressions fail CI.
"""
from __future__ import annotations

import pathlib
import shutil
import subprocess

import pytest

CPP_DIR = pathlib.Path(__file__).resolve().parent.parent / "cpp" / "hanabi"


@pytest.mark.slow
def test_hanabi_engine_under_asan_ubsan():
    if shutil.which("g++") is None:
        pytest.skip("no g++ in image")
    res = subprocess.run(["make", "test-asan"], cwd=str(CPP_DIR),
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "ALL C++ TESTS PASSED" in res.stdout
