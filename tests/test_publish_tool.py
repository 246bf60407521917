"""tools/publish_model.py behavior: the no-downgrade guard and the
companion-report lifecycle.

The publish tool is the unattended retrain chain's last step (reference
distribution layout: config + weights side by side, mel_inverter.py:184-239),
so its guard logic must hold without a human watching:

- a new report with a WORSE mean on the same eval set is refused;
- companion reports (_fp32/_shift) not regenerated for the new weights are
  removed from the registry dir (they describe the replaced checkpoint).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "publish_model.py")


def _report(mean, eval_dir=".data/eval_x"):
    return {
        "mean_mel_L1_dB": mean,
        "eval_dir": eval_dir,
        "files": [{"file": "a.wav", "mel_L1_dB": mean, "dur_s": 1.0}],
    }


def _make_run(tmp_path, name, mean, shift_mean=None):
    from mbexwn_vocoder_tpu.compat.params_io import save_params

    run = tmp_path / name
    run.mkdir()
    save_params(str(run / "weights.npz"),
                {"layer": {"w": np.ones((3, 2), np.float32)}})
    (run / "config.yaml").write_text("mbexwn_config:\n  dummy: 1\n")
    (run / "quality_report.json").write_text(json.dumps(_report(mean)))
    if shift_mean is not None:
        (run / "quality_report_shift.json").write_text(
            json.dumps(_report(shift_mean, eval_dir=".data/eval_shift")))
    return run


def _publish(run, dest, expect_rc=0):
    proc = subprocess.run(
        [sys.executable, TOOL, "--run", str(run), "--dest", str(dest),
         "--report", str(run / "quality_report.json")],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == expect_rc, proc.stderr
    return proc


def test_publish_companion_lifecycle_and_downgrade_guard(tmp_path):
    dest = tmp_path / "registry_model"

    # first publish ships the primary report AND the shift companion
    run1 = _make_run(tmp_path, "run1", mean=8.0, shift_mean=9.0)
    _publish(run1, dest)
    assert json.load(open(dest / "quality_report.json"))["mean_mel_L1_dB"] == 8.0
    assert (dest / "quality_report_shift.json").exists()

    # a better retrain WITHOUT a regenerated shift companion replaces the
    # primary report and removes the stale companion
    run2 = _make_run(tmp_path, "run2", mean=6.0)
    _publish(run2, dest)
    assert json.load(open(dest / "quality_report.json"))["mean_mel_L1_dB"] == 6.0
    assert not (dest / "quality_report_shift.json").exists()

    # a worse retrain on the same eval set is refused and changes nothing
    run3 = _make_run(tmp_path, "run3", mean=7.5)
    proc = _publish(run3, dest, expect_rc=1)
    assert "refusing to downgrade" in proc.stderr
    assert json.load(open(dest / "quality_report.json"))["mean_mel_L1_dB"] == 6.0

    # a worse report on a DIFFERENT eval set is not comparable -> allowed
    run4 = _make_run(tmp_path, "run4", mean=9.9)
    rep = _report(9.9, eval_dir=".data/other_eval")
    (run4 / "quality_report.json").write_text(json.dumps(rep))
    _publish(run4, dest)
    assert json.load(open(dest / "quality_report.json"))["mean_mel_L1_dB"] == 9.9


def test_publish_regime_mismatch_requires_explicit_decision(tmp_path):
    """Round-5 incident guard: means measured under different numerics
    regimes (matmul_precision/platform) are not comparable — after the
    precision fix every re-eval improved ~2.4 dB, so a worse model beat a
    stale pre-fix mean and a downgrade was published.  Regime mismatch must
    refuse (even when the new mean looks better) until the registry control
    is re-measured under the current policy."""
    dest = tmp_path / "registry_model"

    run1 = _make_run(tmp_path, "run1", mean=8.0)  # pre-fix era: no regime keys
    _publish(run1, dest)

    # "better" mean but measured under a different regime -> refused
    run2 = _make_run(tmp_path, "run2", mean=6.0)
    rep = _report(6.0)
    rep.update(matmul_precision="highest", platform="tpu")
    (run2 / "quality_report.json").write_text(json.dumps(rep))
    proc = _publish(run2, dest, expect_rc=1)
    assert "different numerics regime" in proc.stderr
    assert json.load(open(dest / "quality_report.json"))["mean_mel_L1_dB"] == 8.0

    # re-measuring the PUBLISHED weights under the current policy (ship as
    # the control) makes the comparison same-regime again
    ctl = _report(7.0)
    ctl.update(matmul_precision="highest", platform="tpu")
    (dest / "quality_report.json").write_text(json.dumps(ctl))
    _publish(run2, dest)
    assert json.load(open(dest / "quality_report.json"))["mean_mel_L1_dB"] == 6.0
