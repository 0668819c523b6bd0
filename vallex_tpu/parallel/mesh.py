"""Device mesh + sharding rules for multi-chip execution.

The reference is strictly single-device (SURVEY.md §2.3); scale-out here is
green-field TPU design: a 2-D ("dp", "tp") mesh where

  dp  shards the batch/beam axis (data parallelism / batched serving),
  tp  shards the transformer's wide axes megatron-style: the fused QKV and
      FFN-up output columns, the FFN-down/attention-out input rows — XLA
      GSPMD inserts the psum/all-gathers over ICI.

150 M params fit per chip, so parameters default to replication with TP as
an opt-in for latency; activations carry the batch sharding.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def make_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def param_partition_spec(path: str) -> P:
    """Megatron-style TP layout by parameter name path.

    Kernels are stored [in, out] (models/layers.py). Column-parallel: QKV
    in-proj and FFN-up (shard `out`). Row-parallel: attention out-proj and
    FFN-down (shard `in`). Embeddings/predict heads shard the vocab axis.
    Everything small (norms, alphas, stage embeddings) is replicated.
    """
    # layer-stacked leaves have a leading [NL] axis → specs get a None first
    stacked = "ar_decoder" in path or "nar_decoder" in path
    lead = (None,) if stacked else ()

    if "in_proj_w" in path or ("linear1" in path and path.endswith("w")):
        return P(*lead, None, "tp")  # column parallel
    if "out_w" in path or ("linear2" in path and path.endswith("w")):
        return P(*lead, "tp", None)  # row parallel
    if "in_proj_b" in path or ("linear1" in path and path.endswith("b")):
        return P(*lead, "tp")
    if "_embedding" in path and path.endswith("weight") and "language" not in path and "stage" not in path:
        return P("tp", None)  # vocab-sharded embedding tables
    if "predict_layer" in path and path.endswith("w"):
        return P(None, "tp")
    return P(*lead)  # replicated


def _tree_paths(tree: Params, prefix: str = ""):
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _tree_paths(v, path)
        else:
            yield path, v


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Apply TP partition specs (replicated over dp) to the param pytree."""

    def build(tree: Params, prefix: str = "") -> Params:
        out = {}
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out[k] = build(v, path)
            else:
                spec = param_partition_spec(path)
                # drop specs that don't divide evenly (tiny dims) → replicate
                try:
                    out[k] = jax.device_put(v, NamedSharding(mesh, spec))
                except ValueError:
                    out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        return out

    return build(params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over dp, everything else replicated."""
    return NamedSharding(mesh, P("dp"))

def shard_tree(tree, mesh: Mesh):
    """Apply param_partition_spec by path to ANY pytree (TrainState, optax
    optimizer states, …): optimizer moments mirror the param tree, so a
    leaf whose path contains a known parameter name gets that parameter's
    spec; everything else (counts, schedules) replicates. Also normalizes
    device layout after an orbax restore, which can commit scalars to a
    single device while arrays restore sharded."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, v in flat:
        p = "/".join(
            str(getattr(k, "key", getattr(k, "name", k))) for k in path
        )
        try:
            sharded = jax.device_put(
                v, NamedSharding(mesh, param_partition_spec(p))
            )
        except ValueError:
            sharded = jax.device_put(v, NamedSharding(mesh, P()))
        out.append(sharded)
    return jax.tree_util.tree_unflatten(treedef, out)
