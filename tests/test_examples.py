"""The examples/ directory stays runnable.

Each demo is a user-facing entry point (examples/README.md); running them
as real subprocesses catches import breaks, API drift, and the invariants
each script asserts internally (duration match, checkpoint bit-identity,
sync==asyncio agreement).
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"

SCRIPTS = sorted(p.name for p in EXAMPLES.glob("*.py"))


def test_every_example_is_covered():
    # a new example must be picked up by this suite automatically; this
    # guard just documents that the glob is the coverage mechanism
    assert len(SCRIPTS) >= 6


@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / script)],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, (
        f"{script} failed:\n{proc.stdout}\n{proc.stderr}")
    assert proc.stdout.strip().endswith("ok"), proc.stdout
