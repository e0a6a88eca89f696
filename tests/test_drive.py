"""Drive-workload regression gates (the 9.8 km urban-drive class).

The reference's second demonstrated workload is a long drive (reference:
README.md:52).  A 60 s corridor cruise at the flagship operating point
gates end drift and ATE — this is the workload class that exposed the
init-gate bias poisoning (BASELINE.md round 3), so it guards both the
freeze_bias_average fix and general yaw-drift regressions.

Measured at the gate's config (2026-08-21, f32): round 3 ATE 0.059 m /
end drift 2.0 % of a 295 m path; round 4 (forward-rotated init attitude
+ adaptive measurement noise) ATE 0.039 m / 0.11 %.  The gate bounds are
set so a regression to round-3 behavior FAILS.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bench import build_bundles
from rvio_tpu.config import RVIOConfig
from rvio_tpu.dataio.synthetic import simulate_sequence
from rvio_tpu.eval.ate import ate_rmse
from rvio_tpu.runtime.step import make_sequence_scan


@pytest.mark.slow
def test_drive_cruise_drift():
    cfg = RVIOConfig()  # flagship EuRoC operating point
    v = np.array([5.2, 0.8, 0.0])
    sim = simulate_sequence(cfg, duration=60.0, static_time=1.5,
                            ramp_time=5.0, seed=7,
                            n_landmarks=int(105 * 5.26 * 60),
                            meas_noise=0.001, imu_noise=True,
                            drift_velocity=v)
    s0, b0, i0 = build_bundles(cfg, sim, jnp.float32)
    run = make_sequence_scan(cfg)
    st, out = run(jax.tree.map(jnp.copy, s0), b0)
    est = np.asarray(out["p_Gk"])
    gt = sim.gt_p[i0:]
    path = float(np.sum(np.linalg.norm(np.diff(gt, axis=0), axis=1)))
    assert path > 250.0
    end_pct = 100 * float(np.linalg.norm(est[-1] - gt[-1])) / path
    ate = ate_rmse(est, gt)
    # measured 0.11 % / 0.039 m (round 4); round 3 was 2.0 % / 0.059 m and
    # the pre-fix poisoned-bias init 12 % / 1.5 m — both must fail here
    assert end_pct < 1.0, f"drive end drift {end_pct:.2f}% over {path:.0f} m"
    assert ate < 0.10, f"drive ATE {ate:.3f} m"
    # the filter must keep updating the whole drive
    ng = np.asarray(out["n_good"])
    assert ng[len(ng) // 2:].mean() > 5.0
