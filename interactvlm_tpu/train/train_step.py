"""Sharded training step: pjit over the (data, model) mesh with
ZeRO-style optimizer-state sharding.

Replaces the reference's DeepSpeed engine (``model_engine.backward/step``,
train.py:558-562, ZeRO-2 config train.py:356-389):
- gradients are psum-ed by pjit from the batch sharding (DP);
- optimizer state (Adam mu/nu) is sharded over the ``data`` axis (the
  ZeRO-1/2 equivalent) via first-divisible-axis sharding;
- TP shardings on the LLaMA params come from the model's logical axis
  annotations.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from interactvlm_tpu.parallel.mesh import LOGICAL_RULES


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def param_sharding_tree(model, init_fn, mesh: Mesh):
    """Abstract-init the model and derive NamedShardings from the logical
    partitioning metadata."""
    abs_vars = jax.eval_shape(init_fn)
    specs = nn.get_partition_spec(abs_vars)
    return nn.logical_to_mesh_sharding(specs, mesh, list(LOGICAL_RULES)), abs_vars


def zero_shard_leaf(shape_dtype, mesh: Mesh, min_size: int = 2**14):
    """ZeRO heuristic: shard the first axis divisible by the data-axis size
    for sizeable leaves; replicate the rest."""
    n_data = mesh.shape["data"]
    shape = shape_dtype.shape
    size = 1
    for s in shape:
        size *= s
    if size >= min_size:
        for i, s in enumerate(shape):
            if s % n_data == 0 and s > 0:
                spec = [None] * len(shape)
                spec[i] = "data"
                return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def opt_state_shardings(tx, params_shapes, mesh: Mesh, param_shardings=None):
    """Shardings for the optimizer state.

    Adam moments mirror the params; a moment leaf whose param is TP-sharded
    keeps the param's sharding (state and param shardings must agree or
    every step pays resharding traffic), while moments of replicated params
    are ZeRO-sharded over ``data``. Matching is by shape: layers sharing a
    shape share logical axes in this model family.
    """
    abs_state = jax.eval_shape(tx.init, params_shapes)
    n_data = mesh.shape["data"]
    by_shape = {}
    if param_shardings is not None:
        for sd, sh in zip(
            jax.tree.leaves(params_shapes), jax.tree.leaves(param_shardings)
        ):
            by_shape.setdefault((sd.shape, sd.dtype), sh)

    def one(leaf, min_size: int = 2 ** 14):
        sh = by_shape.get((leaf.shape, leaf.dtype))
        if sh is None:
            return zero_shard_leaf(leaf, mesh)
        # start from the param's own (TP) spec, then ZeRO-shard a free axis
        spec = list(sh.spec) + [None] * (len(leaf.shape) - len(sh.spec))
        size = 1
        for s in leaf.shape:
            size *= s
        if size >= min_size:
            for i, s in enumerate(leaf.shape):
                if spec[i] is None and s % n_data == 0 and s > 0:
                    spec[i] = "data"
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(one, abs_state)


def create_sharded_state(model, tx, example_batch, mesh: Mesh, rng=None,
                         frozen_dtype=None):
    """Initialize a TrainState with params placed per their TP annotations
    and optimizer state ZeRO-sharded over ``data``.

    ``frozen_dtype``: store frozen float params in this (compute) dtype --
    bit-identical forward under bf16 modules, halves the frozen SAM/CLIP
    HBM (train/optimizer.cast_frozen_params). None keeps flax's f32.
    """
    rng = jax.random.PRNGKey(0) if rng is None else rng

    def init_fn():
        return model.init(rng, example_batch)

    shardings, abs_vars = param_sharding_tree(model, init_fn, mesh)

    def init_unboxed():
        v = nn.meta.unbox(model.init(rng, example_batch))
        if frozen_dtype is not None:
            from interactvlm_tpu.train.optimizer import cast_frozen_params

            v = cast_frozen_params(v, frozen_dtype)
        return v

    # the sharding tree is dtype-agnostic: casting frozen leaves keeps the
    # tree structure, so the same out_shardings applies
    init_jit = jax.jit(init_unboxed, out_shardings=nn.meta.unbox(shardings))
    with mesh:
        variables = init_jit()

    params_shapes = jax.eval_shape(lambda: variables)
    opt_shardings = opt_state_shardings(
        tx, params_shapes, mesh, param_shardings=nn.meta.unbox(shardings)
    )
    opt_init_jit = jax.jit(tx.init, out_shardings=opt_shardings)
    with mesh:
        opt_state = opt_init_jit(variables)

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables, opt_state=opt_state
    )
    state_shardings = TrainState(
        step=NamedSharding(mesh, P()),
        params=nn.meta.unbox(shardings),
        opt_state=opt_shardings,
    )
    return state, state_shardings


def batch_shardings(example_batch, mesh: Mesh):
    """Shard batch leaves over ``data`` on the leading axis; leaves whose
    leading dim doesn't divide (shared arrays like the human lift maps)
    stay replicated."""
    n_data = mesh.shape["data"]

    def one(leaf):
        if hasattr(leaf, "shape") and leaf.ndim > 0 and leaf.shape[0] % n_data == 0 and leaf.shape[0] >= n_data:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return jax.tree.map(one, example_batch)


def make_train_step(
    model,
    tx,
    mesh: Mesh,
    state_shardings,
    example_batch,
    loss_key: str = "loss",
    donate: bool = True,
    accum_steps: int = 1,
    param_mask=None,
):
    """Build the jit-compiled train step. The batch is sharded over
    ``data`` on its leading axis; pjit inserts the gradient psum.

    ``accum_steps`` > 1 runs gradient accumulation over microbatches
    stacked on a leading axis (batch leaves shaped (accum, micro, ...)),
    matching the reference's manual inner loop (train.py:518-560) as one
    compiled lax.scan.

    ``param_mask`` (params -> bool tree, default the freeze policy's
    ``trainable_mask``) routes FROZEN params around autodiff: their values
    come from a stop-gradient closure, so no tangents enter the frozen
    towers at all. Differentiating the full tree instead (a) pays a wasted
    backward through the frozen SAM/CLIP encoders and (b) fails outright
    on TPU, where the frozen SAM encoder runs Pallas kernels that have no
    JVP rule (jax.grad linearizes every input with a tangent).
    """
    if param_mask is None:
        from interactvlm_tpu.train.optimizer import trainable_mask

        param_mask = trainable_mask

    batch_sharding = batch_shardings(example_batch, mesh)

    def grads_of(params, batch):
        mask = param_mask(params)  # static bool tree
        frozen = jax.lax.stop_gradient(params)

        def loss_fn(p):
            merged = jax.tree.map(
                lambda pt, pf, m: pt if m else pf, p, frozen, mask
            )
            out = model.apply(merged, batch)
            return out[loss_key], out

        # allow_int: QLoRA param trees carry frozen int8 kernels; their
        # cotangents come back as float0 and are rewritten to typed zeros
        # so the optax freeze group (set_to_zero) and the accumulation
        # scan see ordinary arrays. XLA folds the add-zero chains away.
        (_, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True, allow_int=True
        )(params)
        grads = jax.tree.map(
            lambda g, p: (
                jnp.zeros(p.shape, p.dtype)
                if g.dtype == jax.dtypes.float0 else g
            ),
            grads, params,
        )
        metrics = {k: v for k, v in out.items() if jnp.ndim(v) == 0}
        return grads, metrics

    def step_fn(state: TrainState, batch):
        if accum_steps == 1:
            grads, metrics = grads_of(state.params, batch)
        else:
            def micro(carry, mb):
                g_acc, m_acc = carry
                g, m = grads_of(state.params, mb)
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                m_acc = jax.tree.map(jnp.add, m_acc, m)
                return (g_acc, m_acc), None

            first = jax.tree.map(lambda x: x[0], batch)
            g0, m0 = grads_of(state.params, first)
            rest = jax.tree.map(lambda x: x[1:], batch)
            (g_sum, m_sum), _ = jax.lax.scan(micro, (g0, m0), rest)
            grads = jax.tree.map(lambda g: g / accum_steps, g_sum)
            metrics = jax.tree.map(lambda m: m / accum_steps, m_sum)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        # NaN guard: a non-finite loss/grad skips the whole update
        # (reference train.py:547-551 skips the batch), branch-free so it
        # stays inside the compiled step.
        ok = jnp.isfinite(metrics[loss_key]) & jnp.isfinite(
            metrics["grad_norm"]
        )
        new_params = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_params, state.params
        )
        new_opt = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), new_opt, state.opt_state
        )
        metrics["skipped_nonfinite"] = 1.0 - ok.astype(jnp.float32)
        return (
            TrainState(
                step=state.step + ok.astype(state.step.dtype),
                params=new_params,
                opt_state=new_opt,
            ),
            metrics,
        )

    if accum_steps > 1:
        batch_sharding = jax.tree.map(
            lambda s: NamedSharding(
                mesh, P(None, *s.spec)
            ),
            batch_sharding,
        )

    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, batch_sharding),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Mesh, state_shardings, example_batch):
    batch_sharding = batch_shardings(example_batch, mesh)

    def eval_fn(params, batch):
        return model.apply(params, batch)

    return jax.jit(
        eval_fn,
        in_shardings=(state_shardings.params, batch_sharding),
    )
