"""Checkpoint/resume parity (SURVEY.md §5.4): save at frame k, resume, and
finish the run — the artifact must be complete and consistent."""
import os

import numpy as np
import pytest

from fabricate import fabricate_replica
from test_e2e import small_config


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    basedir, seq, _ = fabricate_replica(str(tmp_path / "data"), n_frames=6, semantic=True)
    cfg = small_config(basedir, seq, workdir=str(tmp_path / "out"))
    cfg["save_checkpoints"] = True
    cfg["checkpoint_interval"] = 2
    cfg["tracking"]["num_iters"] = 8
    cfg["mapping"]["num_iters"] = 8

    from hierslam_tpu.slam.pipeline import SLAMRunner

    r1 = SLAMRunner(cfg)
    for t in range(4):
        r1.step(t)
    # frame 4's checkpoint would be written at t=4; use the t=2 one
    ckpt = os.path.join(cfg["workdir"], cfg["run_name"], "params2.npz")
    assert os.path.isfile(ckpt)

    cfg2 = dict(cfg)
    cfg2["load_checkpoint"] = True
    cfg2["checkpoint_time_idx"] = 2
    r2 = SLAMRunner(cfg2)
    assert r2.start_idx == 2
    assert int(r2.variables["n_active"]) > 0
    assert len(r2.gt_w2c_all) == 2
    for t in range(2, 6):
        r2.step(t)
    pn = r2.finalize()
    assert pn["gt_w2c_all_frames"].shape[0] == 6
    assert pn["means3D"].shape[0] > 1000
