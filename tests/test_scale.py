"""Scale-ratio regression job: runs tools/scale_check.py (1× vs 10×) as a
slow-marked test so the superlinear gate is part of the suite, not a
side tool. Opt in with SPARK_GRAFT_SCALE_TEST=1 — the sweep takes
~10 min and needs the 10× fixture (tools/make_scale.py 10) which is
built on first use."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="set SPARK_GRAFT_SCALE_TEST=1 to run the ~10 min scale sweep",
)
def test_scale_ratios_not_superlinear():
    fixture = os.path.join(REPO, ".scale", "x10")
    if not os.path.isdir(fixture):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "make_scale.py"), "10"],
            check=True,
            cwd=REPO,
        )
    # scale_check exits nonzero iff any op's 10× wall exceeds 1.5·K.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scale_check.py"), "10"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, f"superlinear ops flagged:\n{proc.stdout[-3000:]}"
