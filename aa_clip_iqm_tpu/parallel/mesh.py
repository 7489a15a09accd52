"""Device mesh + sharding utilities (the framework's distributed backend).

The reference has no parallelism at all (single process, cuda:0 —
train.py:299-300; SURVEY.md §2 row 19). The TPU-native design is GSPMD:

  - a ('data', 'model') mesh over ICI;
  - batch axes sharded over 'data' (pure data parallelism for training and
    eval — gradients are reduced by compiler-inserted psums over ICI);
  - optionally, backbone attention heads / MLP hidden sharded over 'model'
    (Megatron-style tensor parallelism) for large-image inference;
  - parameters otherwise replicated.

Everything is expressed with jax.sharding.NamedSharding: XLA inserts the
collectives; no hand-written NCCL analogue exists or is needed.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on the data
    axis (ICI-adjacent ordering preserved)."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def make_multislice_mesh(n_slices: int, n_data: Optional[int] = None,
                         n_model: int = 1, devices=None) -> Mesh:
    """('replica', 'data', 'model') mesh for multi-slice (DCN-connected)
    deployments.

    The slice axis is *outermost* so GSPMD maps it onto the slowest network
    tier: tensor-parallel collectives on 'model' and batch all-gathers on
    'data' stay inside a slice (ICI), and only the once-per-step gradient
    psum over 'replica' crosses DCN. On real multi-slice hardware devices
    are grouped by their ``slice_index`` so the mesh rows coincide with
    physical slices; on a flat (single-slice or virtual CPU) topology the
    device list is split evenly, which preserves ICI adjacency within rows.

    The reference has no distributed support at all (SURVEY.md §2 row 19);
    this is the DCN tier of the framework's GSPMD backend.
    """
    devices = list(devices) if devices is not None else jax.devices()
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    multislice_hw = len(slice_ids) > 1 and None not in slice_ids
    if multislice_hw:
        devices = sorted(devices, key=lambda d: (d.slice_index, d.id))
    per_slice = len(devices) // n_slices
    if n_data is None:
        n_data = per_slice // n_model
    if n_data < 1:
        # Without this, n_model > per_slice would give need == 0 and a
        # zero-device (n_slices, 0, n_model) mesh that only fails much
        # later with a cryptic sharding error.
        raise ValueError(
            f"make_multislice_mesh: {len(devices)} devices cannot fit "
            f"{n_slices} slices x n_model={n_model} (data axis would be "
            f"{n_data})")
    need = n_slices * n_data * n_model
    if len(devices) < need:
        raise ValueError(
            f"make_multislice_mesh needs {need} devices "
            f"({n_slices} slices x {n_data} data x {n_model} model), "
            f"only {len(devices)} available")
    arr = np.asarray(devices[:need]).reshape(n_slices, n_data, n_model)
    if multislice_hw:
        # The documented DCN mapping requires each 'replica' row to live in
        # exactly one physical slice; a short device list (need < available)
        # could otherwise straddle slice boundaries after truncation.
        for row in arr:
            row_slices = {d.slice_index for d in row.ravel()}
            if len(row_slices) != 1:
                raise ValueError(
                    "mesh row spans physical slices "
                    f"{sorted(row_slices)}; pass a device list whose "
                    "per-slice counts match n_data*n_model so each "
                    "'replica' row maps to one slice (DCN tier contract)")
    return Mesh(arr, axis_names=("replica", "data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _data_axes(mesh: Mesh):
    return tuple(n for n in mesh.axis_names if n in ("replica", "data"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data-parallel axes ('data',
    plus 'replica' on a multi-slice mesh), replicate the rest."""
    return NamedSharding(mesh, P(_data_axes(mesh)))


def shard_batch(mesh: Mesh, batch):
    """Device-put array leaves of a batch dict with the batch axis sharded."""
    spec = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.device_put(x, spec) if hasattr(x, "shape") and x.ndim
        else x,
        batch,
    )


def replicate(mesh: Mesh, tree):
    spec = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, spec), tree)


# ----------------------------------------------------------------------
# Tensor-parallel parameter shardings for the CLIP backbone (Megatron-style)
# ----------------------------------------------------------------------

def backbone_param_sharding(mesh: Mesh, params):
    """NamedSharding pytree for the frozen CLIP params: attention qkv/out and
    MLP weights sharded over 'model' on their contraction-friendly axes,
    everything else replicated.

    qkv.w (d, 3d): shard output columns (heads)    -> P(None, 'model')
    out.w (d, d):  shard input rows (heads)        -> P('model', None)
    c_fc.w (d, 4d): shard output columns           -> P(None, 'model')
    c_proj.w (4d, d): shard input rows             -> P('model', None)
    biases of column-sharded layers shard likewise; row-sharded layer biases
    replicate.
    """

    def block_spec(block):
        # Stacked-layer layout: leading axis is layers, then torch-equivalent
        # weight axes (see models/clip.py docstring).
        return {
            "ln_1": jax.tree.map(lambda _: P(), block["ln_1"]),
            "attn": {
                "qkv": {"w": P(None, None, "model"), "b": P(None, "model")},
                "out": {"w": P(None, "model", None), "b": P()},
            },
            "ln_2": jax.tree.map(lambda _: P(), block["ln_2"]),
            "mlp": {
                "c_fc": {"w": P(None, None, "model"), "b": P(None, "model")},
                "c_proj": {"w": P(None, "model", None), "b": P()},
            },
        }

    def tower_spec(tower):
        return {
            k: (
                block_spec(v) if k == "blocks"
                else jax.tree.map(lambda _: P(), v)
            )
            for k, v in tower.items()
        }

    spec = {
        "visual": tower_spec(params["visual"]),
        "text": tower_spec(params["text"]),
        "logit_scale": P(),
    }
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), spec,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_backbone(mesh: Mesh, params):
    """Device-put frozen CLIP params with tensor-parallel shardings."""
    shardings = backbone_param_sharding(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
