"""SAM stack tests: tiny-config shapes, window partition round-trip,
rel-pos bias math vs a numpy reference, decoder gradients, postprocess."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.config import sam_tiny
from interactvlm_tpu.models.sam import Sam, postprocess_masks
from interactvlm_tpu.models.sam.image_encoder import (
    decomposed_rel_pos_bias,
    window_partition,
    window_unpartition,
)


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = sam_tiny()
    model = Sam(cfg)
    key = jax.random.PRNGKey(0)
    pixels = jax.random.normal(key, (2, cfg.img_size, cfg.img_size, 3))
    text = jax.random.normal(key, (2, 4, cfg.prompt_embed_dim))
    params = model.init(key, pixels, text)
    return cfg, model, params


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 7 * 9 * 3, dtype=jnp.float32).reshape(2, 7, 9, 3)
    w, pad_hw = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 4, 4, 3)
    back = window_unpartition(w, 4, pad_hw, (7, 9))
    assert np.allclose(np.asarray(back), np.asarray(x))


def test_rel_pos_bias_matches_numpy():
    H = W = 3
    d = 5
    rng = np.random.default_rng(0)
    q = rng.normal(size=(1, 2, H * W, d)).astype(np.float32)
    rh = rng.normal(size=(2 * H - 1, d)).astype(np.float32)
    rw = rng.normal(size=(2 * W - 1, d)).astype(np.float32)

    got = np.asarray(
        decomposed_rel_pos_bias(jnp.asarray(q), jnp.asarray(rh), jnp.asarray(rw), (H, W))
    )

    # literal numpy transcription of add_decomposed_rel_pos
    # (image_encoder.py:354-392) applied to a zero attn map
    Rh = np.zeros((H, H, d))
    Rw = np.zeros((W, W, d))
    for i in range(H):
        for j in range(H):
            Rh[i, j] = rh[i - j + H - 1]
    for i in range(W):
        for j in range(W):
            Rw[i, j] = rw[i - j + W - 1]
    for b in range(1):
        for h in range(2):
            r_q = q[b, h].reshape(H, W, d)
            rel_h = np.einsum("hwc,hkc->hwk", r_q, Rh)
            rel_w = np.einsum("hwc,wkc->hwk", r_q, Rw)
            want = (
                rel_h[:, :, :, None] + rel_w[:, :, None, :]
            ).reshape(H * W, H * W)
            assert np.allclose(got[b, h], want, atol=1e-5)


def test_sam_end_to_end_shapes(tiny_sam):
    cfg, model, params = tiny_sam
    key = jax.random.PRNGKey(1)
    pixels = jax.random.normal(key, (2, cfg.img_size, cfg.img_size, 3))
    text = jax.random.normal(key, (2, 4, cfg.prompt_embed_dim))
    masks, iou = model.apply(params, pixels, text)
    g = cfg.image_embedding_size
    assert masks.shape == (2, 1, 4 * g, 4 * g)
    assert iou.shape == (2, 1)
    assert np.isfinite(np.asarray(masks)).all()


def test_encoder_embedding_shape(tiny_sam):
    cfg, model, params = tiny_sam
    pixels = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
    emb = model.apply(params, pixels, method=Sam.encode_image)
    g = cfg.image_embedding_size
    assert emb.shape == (1, g, g, cfg.prompt_embed_dim)


def test_decoder_gradients_flow(tiny_sam):
    cfg, model, params = tiny_sam
    key = jax.random.PRNGKey(2)
    emb = jax.random.normal(
        key, (1, cfg.image_embedding_size, cfg.image_embedding_size,
              cfg.prompt_embed_dim)
    )
    text = jax.random.normal(key, (1, 2, cfg.prompt_embed_dim))

    def loss(text):
        masks, _ = model.apply(
            params, emb, text, method=Sam.decode_masks
        )
        return (masks ** 2).mean()

    g = jax.grad(loss)(text)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_multimask_output(tiny_sam):
    cfg, model, params = tiny_sam
    emb = jnp.zeros(
        (1, cfg.image_embedding_size, cfg.image_embedding_size,
         cfg.prompt_embed_dim)
    )
    text = jnp.zeros((1, 2, cfg.prompt_embed_dim))
    masks, iou = model.apply(
        params, emb, text, method=Sam.decode_masks, multimask_output=True
    )
    assert masks.shape[1] == cfg.num_multimask_outputs


def test_postprocess_masks():
    low = jnp.ones((2, 1, 8, 8))
    out = postprocess_masks(
        low, img_size=64, input_size=(64, 48), original_size=(100, 75)
    )
    assert out.shape == (2, 1, 100, 75)
    assert np.allclose(np.asarray(out), 1.0, atol=1e-5)


def test_diff_decoder_domains():
    cfg = sam_tiny()
    model = Sam(cfg, use_diff_decoder=True)
    key = jax.random.PRNGKey(0)
    g = cfg.image_embedding_size
    emb = jax.random.normal(key, (1, g, g, cfg.prompt_embed_dim))
    text = jax.random.normal(key, (1, 2, cfg.prompt_embed_dim))
    params = model.init(
        key, jnp.zeros((1, cfg.img_size, cfg.img_size, 3)), text,
        method=Sam.init_all,
    )
    mh, _ = model.apply(params, emb, text, "hcontact", method=Sam.decode_masks)
    mo, _ = model.apply(params, emb, text, "oafford", method=Sam.decode_masks)
    # separately initialized decoders must differ
    assert not np.allclose(np.asarray(mh), np.asarray(mo))


def test_int8_encoder_serving_parity():
    """SAMConfig.weights_int8: a dense-trained encoder converted via
    int8_sam_encoder_params reproduces the bf16 encoder's features within
    int8 tolerance on the tiny config (opt-in serving mode; the reference
    bnb path skips vision towers, so default stays dense)."""
    import dataclasses

    from interactvlm_tpu.config import sam_tiny
    from interactvlm_tpu.models.sam.image_encoder import ImageEncoderViT
    from interactvlm_tpu.utils.weights import int8_sam_encoder_params

    cfg = sam_tiny()
    enc = ImageEncoderViT(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, cfg.img_size, cfg.img_size, 3))
    params = enc.init(key, x)
    want = enc.apply(params, x)

    qcfg = dataclasses.replace(cfg, weights_int8=True)
    qenc = ImageEncoderViT(qcfg)
    qparams = {"params": int8_sam_encoder_params(params["params"])}
    import flax.linen as nn

    # structures must match the int8 module's own init (unbox the
    # logical-partitioning metadata before comparing)
    want_tree = jax.tree_util.tree_structure(
        nn.meta.unbox(qenc.init(key, x))
    )
    assert jax.tree_util.tree_structure(qparams) == want_tree
    got = qenc.apply(qparams, x)
    err = np.abs(np.asarray(got) - np.asarray(want))
    rel = err.mean() / (np.abs(np.asarray(want)).mean() + 1e-8)
    assert rel < 0.1, rel
