"""Live HTTP viewer (the headless stand-in for rviz, System.cc:386-434)."""

import urllib.request

import numpy as np

from rvio_tpu.utils.live_viewer import LiveViewer


def test_viewer_serves_page_and_svg():
    poses = [(0.0, np.array([0.0, 0.0, 0.0]), np.array([0, 0, 0, 1.0]))]
    v = LiveViewer(lambda: poses, port=0).start()
    try:
        base = f"http://127.0.0.1:{v.port}"
        page = urllib.request.urlopen(base + "/", timeout=5).read()
        assert b"rvio_tpu live" in page
        # empty-ish trajectory still serves valid SVG
        svg = urllib.request.urlopen(base + "/traj.svg", timeout=5).read()
        assert svg.startswith(b"<svg")
        # grow the trajectory; the served SVG tracks it
        for k in range(1, 50):
            poses.append((k * 0.05, np.array([0.1 * k, 0.05 * k, 0.0]),
                          np.array([0, 0, 0, 1.0])))
        svg = urllib.request.urlopen(base + "/traj.svg", timeout=5).read()
        assert b"polyline" in svg
        meta = urllib.request.urlopen(base + "/meta", timeout=5).read()
        assert b"poses: 50" in meta
    finally:
        v.stop()
