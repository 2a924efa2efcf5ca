"""13B-shape TP sharding checks on the virtual CPU mesh (VERDICT r3 #7).

``jax.eval_shape`` + sharding-spec divisibility at the flagship's REAL
shapes -- no FLOPs, so the full 13B layout is validated in CI. The
reference trains/serves LISA-13B (train.py:254, run_demo.py:106-129);
its tokenizer length after [SEG] registration is odd (utils/utils.py:
335-362), which is exactly the case that breaks a sharded vocab axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax
import pytest

from interactvlm_tpu.config import llama_13b, llama_tiny
from interactvlm_tpu.models.llama import LlamaForCausalLM
from interactvlm_tpu.parallel.mesh import LOGICAL_RULES, create_mesh
from interactvlm_tpu.train.train_step import opt_state_shardings


def _check_divisible(abs_vars, shardings, mesh):
    bad = []
    for (path, leaf), s in zip(
        jax.tree_util.tree_leaves_with_path(abs_vars),
        jax.tree_util.tree_leaves(shardings),
    ):
        for i, ax in enumerate(s.spec):
            if ax is None:
                continue
            axes = (ax,) if isinstance(ax, str) else ax
            n = 1
            for a in axes:
                n *= mesh.shape[a]
            if leaf.shape[i] % n != 0:
                bad.append((jax.tree_util.keystr(path), leaf.shape, s.spec))
    assert not bad, bad


@pytest.mark.parametrize("n_data,n_model", [(4, 2), (2, 4), (1, 8)])
def test_13b_param_and_optstate_shardings_divide(n_data, n_model):
    """Every TP/ZeRO-sharded dim of the 13B params AND Adam moments must
    divide its mesh axis -- at the real tokenizer length (32000 + 3 seg
    tokens), which is only shardable because the tables are padded
    (LlamaConfig.padded_vocab_size)."""
    cfg = llama_13b(dtype=jnp.bfloat16, vocab_size=32003, lora_rank=8)
    model = LlamaForCausalLM(cfg)
    mesh = create_mesh(n_data, n_model)
    ids = jnp.zeros((8, 16), jnp.int32)

    abs_vars = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids)
    specs = nn.get_partition_spec(abs_vars)
    shardings = nn.logical_to_mesh_sharding(specs, mesh, list(LOGICAL_RULES))
    abs_vars, shardings = nn.meta.unbox(abs_vars), nn.meta.unbox(shardings)
    _check_divisible(abs_vars, shardings, mesh)

    tx = optax.adamw(1e-4)
    opt_sh = opt_state_shardings(tx, abs_vars, mesh,
                                 param_shardings=shardings)
    abs_opt = jax.eval_shape(tx.init, abs_vars)
    _check_divisible(abs_opt, opt_sh, mesh)


def test_13b_serving_param_shapes_kv_layout():
    """KV-cache layout under TP: kv_heads (40) shards over n_model=2/4/8?
    40 % 8 = 0; the cache tensors must follow (batch, len, kv_heads, d)."""
    from interactvlm_tpu.models.llama import init_kv_cache

    cfg = llama_13b(dtype=jnp.bfloat16, vocab_size=32003)
    caches = jax.eval_shape(lambda: init_kv_cache(cfg, 4, 351))
    k = caches[0]["k"]
    assert k.shape == (4, 351, cfg.num_kv_heads, cfg.head_dim)
    for n_model in (2, 4, 8):
        assert cfg.num_kv_heads % n_model == 0
        assert cfg.num_heads % n_model == 0
        assert cfg.intermediate_size % n_model == 0
        assert cfg.padded_vocab_size % n_model == 0


def test_padded_vocab_logits_masked():
    """Pad columns never win an argmax and vanish from the softmax."""
    import dataclasses

    cfg = dataclasses.replace(llama_tiny(), vocab_size=130)  # padded -> 256
    assert cfg.padded_vocab_size == 256
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 130, (2, 6)), jnp.int32
    )
    params = model.init(jax.random.PRNGKey(0), ids)
    logits, _ = model.apply(params, ids)
    assert logits.shape[-1] == 256
    pad = np.asarray(logits[..., 130:])
    assert (pad <= -1e29).all()
    assert (np.asarray(jnp.argmax(logits, -1)) < 130).all()


def test_resize_token_tables_pads_to_multiple():
    from interactvlm_tpu.utils.weights import resize_token_tables

    dim = 8
    params = {
        "model": {"embed_tokens": {
            "embedding": np.ones((128, dim), np.float32)}},
        "lm_head": {"kernel": np.ones((dim, 128), np.float32)},
    }
    out = resize_token_tables(params, new_vocab=131)
    emb = out["model"]["embed_tokens"]["embedding"]
    head = out["lm_head"]["kernel"]
    assert emb.shape == (256, dim) and head.shape == (dim, 256)
    # rows for the 3 REAL new tokens: mean-init (HF semantics); pad rows 0
    assert np.allclose(emb[128:131], emb[:128].mean(0))
    assert (emb[131:] == 0).all() and (head[:, 131:] == 0).all()


@pytest.mark.parametrize("n_data,n_model", [(4, 2), (2, 4)])
def test_13b_qlora_training_state_shardings_divide(n_data, n_model):
    """TRAINING analog of the serving check (VERDICT r3 #7): the 13B QLoRA
    train state -- int8 frozen base + bf16 LoRA/table trainables under the
    real masked optimizer -- sharded over (data, model), with every
    partitioned dim dividing its mesh axis and Adam moments existing ONLY
    for trainable leaves (optax.masked leaves MaskedNode elsewhere;
    unmasked 13B f32 moments alone would be ~100 GB)."""
    from interactvlm_tpu.train.optimizer import make_optimizer, trainable_mask

    cfg = llama_13b(dtype=jnp.bfloat16, vocab_size=32003, lora_rank=8,
                    weights_int8=True)
    model = LlamaForCausalLM(cfg)
    mesh = create_mesh(n_data, n_model)
    ids = jnp.zeros((8, 16), jnp.int32)

    abs_vars = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids)
    specs = nn.get_partition_spec(abs_vars)
    shardings = nn.logical_to_mesh_sharding(specs, mesh, list(LOGICAL_RULES))
    abs_vars, shardings = nn.meta.unbox(abs_vars), nn.meta.unbox(shardings)
    _check_divisible(abs_vars, shardings, mesh)

    # the freeze policy keys off the composite tree where LLaMA lives
    # under "lm/" (train/optimizer.py lora_only_llama); mirror that prefix
    tx, _ = make_optimizer(
        3e-4, mask=lambda p: trainable_mask({"lm": p})["lm"]
    )
    abs_opt = jax.eval_shape(tx.init, abs_vars)
    opt_sh = opt_state_shardings(tx, abs_vars, mesh,
                                 param_shardings=shardings)
    _check_divisible(abs_opt, opt_sh, mesh)

    # moments exist only for trainables; total moment bytes stay adapter-
    # scale (tables + LoRA + heads), nowhere near the 26 GB of a full 13B
    moment_bytes = sum(
        int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(abs_opt)
        if hasattr(leaf, "shape") and leaf.ndim > 0
    )
    base_bytes = sum(
        int(np.prod(leaf.shape)) * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(abs_vars)
    )
    assert moment_bytes < 0.25 * base_bytes, (moment_bytes, base_bytes)
