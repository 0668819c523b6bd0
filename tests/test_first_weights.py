"""The day-one trained-weights playbook (tools/first_weights.py) must be
rehearsable today: --dry-run reconstructs the reference's torch VALLE in
the real checkpoint format and the pipeline (convert → per-layer parity →
e2e greedy parity) runs end to end.
"""

import os
import sys

import pytest

from tests.conftest import reference_available

if not reference_available():  # pragma: no cover
    pytest.skip("reference not mounted", allow_module_level=True)

pytest.importorskip("torch")

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)


@pytest.mark.slow
def test_dry_run_small(tmp_path):
    import first_weights as FW

    rc = FW.main([
        "--dry-run", "--small", "--checkpoint-dir", str(tmp_path),
    ])
    assert rc == 0
    report = (tmp_path / "FIRST_WEIGHTS_REPORT.md").read_text()
    assert "parity:e2e-greedy | PASS" in report
    assert "parity:ar-layers | PASS" in report
    assert "convert | PASS" in report
    assert "FAIL" not in report
    # the converted native checkpoint is loadable
    assert (tmp_path / "vallex-jax.npz").exists()
