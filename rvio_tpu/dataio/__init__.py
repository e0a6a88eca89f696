"""Data IO: synthetic simulator, EuRoC ASL loader, TUM trajectory format."""

from rvio_tpu.dataio.synthetic import SyntheticSequence, simulate_sequence
from rvio_tpu.dataio.tum import write_tum, read_tum

__all__ = ["SyntheticSequence", "simulate_sequence", "write_tum", "read_tum"]
