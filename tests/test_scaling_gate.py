"""Scaling-regression gate (round-4 verdict #9): re-measure the
sf1->sf10 segment for the pinned study queries and fail when any
segment slope worsened by >0.15 — so a code change cannot silently
re-introduce a super-linear term (the PageRank lineage trap was only
caught because someone re-measured).

Gated behind SPARK_GRAFT_SCALE_CHECK=1 because a faithful check runs
the heavy queries at sf1/sf10 (minutes, needs the ~2 GB .scale_data
replicas from tools/gen_scale_data.py) — far too slow for the default
unit run. CI/driver runs: SPARK_GRAFT_SCALE_CHECK=1 python -m pytest
tests/test_scaling_gate.py -q  (or python tools/scale_study.py --check
directly; this test and the CLI share one code path).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_CHECK") != "1",
    reason="set SPARK_GRAFT_SCALE_CHECK=1 to run the multi-minute scale gate",
)
@pytest.mark.skipif(
    not os.path.isdir(os.path.join(_REPO, ".scale_data", "sf10")),
    reason="needs .scale_data replicas (tools/gen_scale_data.py)",
)
def test_scale_slopes_within_pins():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "scale_study.py"), "--check"],
        cwd=_REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, f"\n{proc.stdout}\n{proc.stderr}"
