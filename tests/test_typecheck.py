"""Static type gate (reference: mypy ``strict = true`` over the whole
package, reference ``backend/pyproject.toml`` — its de-facto safety net
per SURVEY §4).

This environment ships no type checker and installs are disallowed, so
the gate runs whenever mypy is importable (CI images that have it) and
skips otherwise.  Config lives in ``pyproject.toml [tool.mypy]``.
"""

import importlib.util
import subprocess
import sys

import pytest


def test_mypy_gate():
    if importlib.util.find_spec("mypy") is None:
        pytest.skip("mypy not installed in this environment (no installs)")
    proc = subprocess.run(
        [sys.executable, "-m", "mypy", "--config-file", "pyproject.toml"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
