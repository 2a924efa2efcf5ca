"""Named communication layer over the device mesh.

The reference reaches NCCL two ways -- DeepSpeed's ZeRO internals and
direct ``torch.distributed`` calls (``dist.all_reduce`` in the meters,
``all_gather``/``all_gather_object`` at eval; SURVEY.md §5). Here the
equivalents are XLA collectives riding ICI, expressed through
``shard_map`` so call sites read like the reference's:

- ``all_reduce_mean/sum``: gradient/metric reductions over ``data``;
- ``all_gather_batch``: eval prediction collection over ``data``;
- ``psum_scatter``: the ZeRO-2 reduce-scatter primitive;
- ``host_gather``: cross-process object gather (multihost_utils), the
  ``all_gather_object`` analogue.

pjit inserts these automatically from shardings in the training path; the
explicit forms exist for hand-rolled SPMD regions (Pallas ring kernels,
eval drivers) and to keep the comm layer a named, testable component.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.5 top-level API; the experimental path is deprecated
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _smap(fn, mesh: Mesh, in_spec, out_spec):
    return shard_map(
        fn, mesh=mesh, in_specs=in_spec, out_specs=out_spec,
        check_vma=False,
    )


def all_reduce_sum(x, mesh: Mesh, axis: str = "data"):
    """Sum over one mesh axis; result replicated on that axis."""
    return _smap(
        lambda v: jax.lax.psum(v, axis), mesh, P(axis), P()
    )(x)


def all_reduce_mean(x, mesh: Mesh, axis: str = "data"):
    return _smap(
        lambda v: jax.lax.pmean(v, axis), mesh, P(axis), P()
    )(x)


def all_gather_batch(x, mesh: Mesh, axis: str = "data"):
    """Gather shards of a batch-sharded array onto every device
    (the eval ``all_gather`` of predictions, evaluate.py:209-215)."""
    return _smap(
        lambda v: jax.lax.all_gather(v, axis, axis=0, tiled=True),
        mesh, P(axis), P(),
    )(x)


def psum_scatter(x, mesh: Mesh, axis: str = "data"):
    """Reduce-scatter along the leading dim (ZeRO-2's gradient primitive,
    reference ds_config reduce_scatter, train.py:372-373): every device
    holds a full per-device partial (replicated spec in); each ends up
    owning the summed slice of its rank."""
    return _smap(
        lambda v: jax.lax.psum_scatter(v, axis, scatter_dimension=0,
                                       tiled=True),
        mesh, P(), P(axis),
    )(x)


def ppermute_ring(x, mesh: Mesh, axis: str = "data", shift: int = 1):
    """Ring rotation along a mesh axis (building block for hand-rolled
    pipelines/ring collectives)."""
    n = mesh.shape[axis]
    perm = [(i, (i + shift) % n) for i in range(n)]
    return _smap(
        lambda v: jax.lax.ppermute(v, axis, perm), mesh, P(axis), P(axis)
    )(x)


def host_gather(value):
    """Gather a host-local array across JAX processes (the
    ``all_gather_object`` analogue); identity in single-process runs."""
    if jax.process_count() == 1:
        return [value]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(value))
