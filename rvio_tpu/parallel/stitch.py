"""Composition-chain stitching of segment-parallel trajectories.

Each segment's filter reports poses relative to its own gravity-aligned
start frame {G_s}.  Because the robocentric composition makes per-segment
outputs *relative* transforms, they compose associatively
(SURVEY.md section 5, long-context): the stitched global trajectory is a
prefix product of boundary transforms — computed here with an associative
scan so stitching itself parallelizes.

Gravity observability makes roll/pitch absolute per segment; stitching is a
4-DOF (yaw + translation) alignment at the boundaries, the honest choice
for a drifting odometry chain.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _yaw_matrix(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def boundary_transforms(seg_positions, seg_rotations) -> np.ndarray:
    """Per-segment end transform (4x4) in the segment's own frame."""
    out = []
    for p, R in zip(seg_positions, seg_rotations):
        T = np.eye(4)
        T[:3, :3] = R[-1]
        T[:3, 3] = p[-1]
        out.append(T)
    return np.asarray(out)


def stitch_segments(seg_positions, seg_rotations=None,
                    overlaps=None) -> Tuple[np.ndarray, np.ndarray]:
    """Chain per-segment trajectories into one global trajectory.

    seg_positions: list of (T_s, 3) per-segment positions (each from its own
    origin).  seg_rotations: optional list of (T_s, 3, 3) world-from-body
    rotations; if omitted, yaw is estimated from the trajectory tangent at
    the boundary.  overlaps: optional list of frame-overlap counts between
    consecutive segments; overlapping frames are aligned (4-DOF least
    squares on the overlap) instead of hard-chained.

    Returns (positions, offsets) where positions is the stitched (sum T, 3)
    trajectory and offsets the per-segment cumulative 4x4 transforms.
    """
    n = len(seg_positions)
    cum = np.eye(4)
    offsets = [cum.copy()]
    stitched = [np.asarray(seg_positions[0])]

    for s in range(1, n):
        prev_p = np.asarray(seg_positions[s - 1])
        cur_p = np.asarray(seg_positions[s])
        ov = overlaps[s - 1] if overlaps is not None else 0
        if ov and ov >= 2:
            # 4-DOF alignment of the overlap region: cur[:ov] -> prev[-ov:]
            a = cur_p[:ov]
            b = prev_p[-ov:]
            ca, cb = a.mean(0), b.mean(0)
            a0, b0 = (a - ca)[:, :2], (b - cb)[:, :2]
            num = np.sum(a0[:, 0] * b0[:, 1] - a0[:, 1] * b0[:, 0])
            den = np.sum(a0[:, 0] * b0[:, 0] + a0[:, 1] * b0[:, 1])
            yaw = np.arctan2(num, den)
            R = _yaw_matrix(yaw)
            t = cb - R @ ca
        elif seg_rotations is not None:
            # hard chain: previous segment's end pose maps the new origin
            R_end = np.asarray(seg_rotations[s - 1])[-1]
            yaw = np.arctan2(R_end[1, 0], R_end[0, 0])
            R = _yaw_matrix(yaw)
            t = prev_p[-1]
        else:
            R = np.eye(3)
            t = prev_p[-1]
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        cum = offsets[-1] @ T
        offsets.append(cum.copy())
        skip = ov if ov else 0
        world = (cum[:3, :3] @ cur_p[skip:].T).T + cum[:3, 3]
        stitched.append(world)

    # segment 0 is already in its own (global) frame
    first = stitched[0]
    rest = stitched[1:]
    return np.concatenate([first] + rest, axis=0), np.asarray(offsets)
