"""Runtime: the jitted per-frame step, sequence driver, and init gate."""

from rvio_tpu.runtime.step import FrameBundle, make_filter_step
from rvio_tpu.runtime.driver import SequenceDriver, InitializationGate

__all__ = ["FrameBundle", "make_filter_step", "SequenceDriver",
           "InitializationGate"]
