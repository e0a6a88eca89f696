"""Checkpoint / resume of the full filter session.

The reference cannot be resumed mid-sequence — its state lives in RAM and
only two .dat files are ever written (reference: System.cc:83-88).  With
fixed-shape arrays, checkpointing the complete session (filter state,
tracker state, RNG key, frame cursor) is a flat .npz — this enables
warm-handoff segment parallelism and fault recovery.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rvio_tpu.state.filter_state import FilterState

_FILTER_FIELDS = [f.name for f in dataclasses.fields(FilterState)]


def save_checkpoint(path: str, state: FilterState, *,
                    tracker_state=None, rng_key=None,
                    frame_cursor: int = 0, timestamp: float = 0.0) -> None:
    arrs = {f"filter.{k}": np.asarray(getattr(state, k))
            for k in _FILTER_FIELDS}
    if tracker_state is not None:
        arrs["tracker.pos"] = np.asarray(tracker_state.pos)
        arrs["tracker.hist"] = np.asarray(tracker_state.hist)
        arrs["tracker.length"] = np.asarray(tracker_state.length)
        arrs["tracker.active"] = np.asarray(tracker_state.active)
        for i, lvl in enumerate(tracker_state.pyramid):
            arrs[f"tracker.pyr{i}"] = np.asarray(lvl)
    if rng_key is not None:
        arrs["rng_key"] = np.asarray(jax.random.key_data(rng_key))
    arrs["meta"] = np.asarray([frame_cursor, timestamp])
    np.savez_compressed(path, **arrs)


def load_checkpoint(path: str, dtype=jnp.float32):
    """Returns (filter_state, tracker_arrays_or_None, rng_key_or_None,
    frame_cursor, timestamp)."""
    z = np.load(path)
    fkw = {}
    for k in _FILTER_FIELDS:
        if k == "sigma2_scale" and f"filter.{k}" not in z:
            fkw[k] = jnp.ones((), dtype)
            continue
        if k == "clones_fej" and f"filter.{k}" not in z:
            # checkpoints written before the FEJ window existed: seed the
            # first estimates from the current clones
            fkw[k] = jnp.copy(fkw["clones"])
            continue
        v = z[f"filter.{k}"]
        if v.dtype.kind == "f":
            fkw[k] = jnp.asarray(v, dtype)
        else:
            fkw[k] = jnp.asarray(v)
    state = FilterState(**fkw)

    tracker = None
    if "tracker.pos" in z:
        pyr = []
        i = 0
        while f"tracker.pyr{i}" in z:
            pyr.append(jnp.asarray(z[f"tracker.pyr{i}"], dtype))
            i += 1
        from rvio_tpu.frontend.tracker import TrackerState
        tracker = TrackerState(
            pos=jnp.asarray(z["tracker.pos"], dtype),
            hist=jnp.asarray(z["tracker.hist"], dtype),
            length=jnp.asarray(z["tracker.length"]),
            active=jnp.asarray(z["tracker.active"]),
            pyramid=tuple(pyr))

    key = None
    if "rng_key" in z:
        key = jax.random.wrap_key_data(jnp.asarray(z["rng_key"]))

    cursor, ts = z["meta"]
    return state, tracker, key, int(cursor), float(ts)
