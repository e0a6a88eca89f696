"""Utilities: visualization, timing instrumentation, logging."""

from rvio_tpu.utils.visualize import (draw_tracks, draw_detections,
                                      save_debug_image, plot_trajectory_svg)

__all__ = ["draw_tracks", "draw_detections", "save_debug_image",
           "plot_trajectory_svg"]
