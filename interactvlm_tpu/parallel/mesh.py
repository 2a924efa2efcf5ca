"""Device mesh + sharding rules: the TPU-native replacement for the
reference's DeepSpeed ZeRO-2 / NCCL runtime (reference ``train.py:356-389``,
``utils/utils.py:176-198``).

Design (SURVEY.md §2.6):
- mesh axes ``(data, model)``: data parallelism over ``data`` (gradients
  psum-ed by pjit, optimizer state sharded over ``data`` = ZeRO-equivalent),
  tensor parallelism for the LLaMA-13B decoder over ``model`` (attention
  heads / MLP columns).
- collectives are inserted by XLA from sharding annotations and ride ICI;
  no hand-written comm layer is needed.

Model code annotates params with *logical* axis names; ``LOGICAL_RULES``
maps them onto mesh axes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("data", "model")

# logical axis -> mesh axis (None = replicated)
LOGICAL_RULES: Sequence[Tuple[str, Optional[str]]] = (
    ("batch", "data"),
    ("vocab", "model"),        # embedding table sharded over model axis
    ("embed", None),           # hidden dim replicated
    ("mlp", "model"),          # MLP up/gate columns
    ("heads", "model"),        # attention heads
    ("kv_heads", "model"),
    ("head_dim", None),
    ("seq", None),
    ("norm", None),
)


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh from the available devices.

    Defaults to all devices on the data axis. ICI-friendly: model axis
    varies fastest (adjacent devices) so TP collectives stay on-chip
    neighbors.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (
        f"mesh {n_data}x{n_model} does not tile {n} devices; pick an "
        f"n_model that divides the device count"
    )
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, MESH_AXES)


def logical_to_mesh(logical_axes) -> P:
    """Translate a tuple of logical axis names to a PartitionSpec."""
    rules = dict(LOGICAL_RULES)
    return P(*(rules.get(a, None) for a in logical_axes))


def _axes_of(path, leaf) -> P:
    """Derive a PartitionSpec for a param from flax partitioning metadata
    (``nn.with_logical_partitioning``) or fall back to replicated."""
    names = getattr(leaf, "names", None)
    if names is not None:
        return logical_to_mesh(names)
    return P()


def param_shardings(params, mesh: Mesh):
    """PyTree of NamedShardings matching ``params`` (boxed or plain)."""

    def one(leaf):
        return NamedSharding(mesh, _axes_of(None, leaf))

    return jax.tree.map(
        one, params, is_leaf=lambda x: hasattr(x, "names") or not isinstance(x, dict)
    )


def shard_params(params, mesh: Mesh):
    """Device-put params onto the mesh per their logical annotations.

    Accepts a flax param tree possibly containing ``nn.Partitioned`` boxes;
    returns an unboxed tree of sharded arrays plus the sharding tree.
    """
    import flax.linen as nn

    shardings = nn.logical_to_mesh_sharding(
        nn.get_partition_spec(params), mesh, LOGICAL_RULES
    )
    unboxed = nn.meta.unbox(params)
    placed = jax.tree.map(
        lambda x, s: jax.device_put(x, s), unboxed, shardings
    )
    return placed, shardings
