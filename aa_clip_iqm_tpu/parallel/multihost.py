"""Multi-host (multi-process) readiness for real TPU pods.

The reference is strictly single-process/single-GPU (train.py:299-300); the
framework's GSPMD backend (parallel/mesh.py) already expresses every sharding
globally, so scaling to a pod — where each host runs one process that owns a
subset of the chips — needs exactly three things, provided here:

  1. runtime init: ``jax.distributed.initialize`` before first backend use
     (``maybe_initialize``, opt-in via AACLIP_MULTIHOST=1 or explicit args);
  2. a data contract: which rows of the global batch each process must load
     (``process_local_rows``);
  3. global-array assembly: turning those process-local rows into one global
     sharded jax.Array per batch leaf
     (``global_device_batch`` -> jax.make_array_from_process_local_data).

On a single process (this machine: one host, one chip) everything degrades
to plain ``device_put`` with the same shardings, which is how it is tested
(tests/test_parallel.py); the multi-process branches follow the documented
JAX contract and need a real pod to execute. Recipe: docs/DESIGN.md
"Multi-host".
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from .mesh import batch_sharding


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when running on a pod.

    Opt-in: runs when called with explicit arguments, or when
    AACLIP_MULTIHOST=1 (TPU pod auto-detection supplies the coordinator /
    process topology). Returns True if initialization happened. Must be
    called before the first backend touch in every process; safe to call
    again afterwards (no-op) and on single-process setups (AACLIP_MULTIHOST
    unset -> no-op).
    """
    explicit = coordinator_address is not None
    if not explicit and os.environ.get("AACLIP_MULTIHOST") != "1":
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return False
        raise


def process_local_rows(mesh, global_batch: int) -> Tuple[int, int]:
    """Row range [start, stop) of the global batch this process must load.

    Derived from the batch sharding's addressable shards, so it is correct
    for any mesh whose data-parallel tiers put contiguous row blocks on this
    process (the construction in parallel/mesh.py: devices ordered
    process-major, batch axis sharded over ('replica','data'), 'model'-axis
    replicas dedup to the same rows). Raises if the addressable rows are not
    one contiguous block — feeding such a layout from per-process loaders
    would interleave rows and silently train on the wrong data.
    """
    sharding = batch_sharding(mesh)
    idx_map = sharding.addressable_devices_indices_map((global_batch,))
    blocks = set()
    for idx in idx_map.values():
        sl = idx[0]
        start = 0 if sl.start is None else int(sl.start)
        stop = global_batch if sl.stop is None else int(sl.stop)
        blocks.add((start, stop))
    lo = min(s for s, _ in blocks)
    hi = max(e for _, e in blocks)
    if sum(e - s for s, e in blocks) != hi - lo:
        raise ValueError(
            f"process-addressable batch rows are not contiguous: {sorted(blocks)}; "
            "build the mesh with process-major device order (parallel/mesh.py)")
    return lo, hi


def global_device_batch(mesh, local_batch: dict, global_batch: int) -> dict:
    """Assemble globally-sharded batch arrays from process-local rows.

    ``local_batch`` holds this process's rows (``process_local_rows``) of
    each array leaf; non-array leaves (e.g. class-name lists) pass through.
    Single-process: a plain sharded device_put of the (already-global) batch.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if not (hasattr(x, "shape") and getattr(x, "ndim", 0)):
            return x
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(
            sharding, x, (global_batch,) + tuple(x.shape[1:]))

    return {k: put(v) for k, v in local_batch.items()}
