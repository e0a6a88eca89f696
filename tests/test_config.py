"""Config system tests: native schema + reference OpenCV-YAML compatibility."""

import numpy as np
import pytest

from rvio_tpu.config import RVIOConfig, load_config, load_reference_config


REF_STYLE_YAML = """%YAML:1.0

IMU.dps: 200
IMU.sigma_g: 1.6968e-04
IMU.sigma_wg: 1.9393e-05
IMU.sigma_a: 2.0000e-3
IMU.sigma_wa: 3.0000e-3
IMU.nG: 9.8082
IMU.nSmallAngle: 0.001745329

Camera.fps: 20
Camera.RGB: 0
Camera.Fisheye: 0
Camera.width: 752
Camera.height: 480
Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375
Camera.k1: -0.28340811
Camera.k2: 0.07395907
Camera.p1: 0.00019359
Camera.p2: 1.76187114e-05
Camera.sigma_px: 0.002180293
Camera.sigma_py: 0.002186767
Camera.T_BC0: !!opencv-matrix
    rows: 4
    cols: 4
    dt: d
    data: [ 0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975,
            0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768,
           -0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949,
            0.0, 0.0, 0.0, 1.0]
Camera.nTimeOffset: 0

Tracker.nFeatures: 150
Tracker.nMaxTrackingLength: 12
Tracker.nMinTrackingLength: 3
Tracker.nMinDist: 15
Tracker.nQualLvl: 0.01
Tracker.nBlockSizeX: 150
Tracker.nBlockSizeY: 120
Tracker.EnableEqualizer: 1
Tracker.UseSampson: 1
Tracker.nInlierThrd: 1e-5

INI.nThresholdAngle: 0.005
INI.nThresholdDispl: 0.01
INI.EnableAlignment: 1
INI.RecordOutputs: 0

Landmark.nScale: 0.05
Landmark.nPubRate: 4
"""


class TestReferenceFormat:
    def test_parses_cv_yaml(self, tmp_path):
        p = tmp_path / "ref.yaml"
        p.write_text(REF_STYLE_YAML)
        cfg = load_reference_config(str(p))
        assert cfg.imu.rate_hz == 200
        assert cfg.camera.fx == pytest.approx(458.654)
        assert cfg.tracker.num_features == 150
        assert cfg.tracker.max_tracking_length == 12
        assert cfg.window_size == 11
        assert cfg.init.enable_alignment is True
        R = cfg.camera.R_bc
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        np.testing.assert_allclose(cfg.camera.t_bc,
                                   [-0.0216401454975, -0.064676986768,
                                    0.00981073058949])
        assert cfg.landmark.scale == pytest.approx(0.05)
        assert cfg.landmark.pub_rate == pytest.approx(4.0)

    def test_load_config_auto_detects(self, tmp_path):
        p = tmp_path / "ref.yaml"
        p.write_text(REF_STYLE_YAML)
        cfg = load_config(str(p))
        assert cfg.tracker.num_features == 150

    def test_derived_dims(self):
        cfg = RVIOConfig()
        assert cfg.state_dim == 26 + 7 * 14 == 124
        assert cfg.err_dim == 24 + 6 * 14 == 108
        assert cfg.tracker.max_update_features == 100
        assert cfg.min_clone_states == 2


class TestNativeFormat:
    def test_loads_repo_example(self):
        cfg = load_config("configs/euroc.yaml")
        assert cfg.imu.rate_hz == 200
        assert cfg.tracker.num_features == 200
        assert cfg.tpu.use_pallas is True
        assert cfg.init.sigma_v0 == pytest.approx(0.1)
