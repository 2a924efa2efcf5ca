"""Composite InteractVLM model tests: mixed-task training forward, loss
structure, gradient flow/freezing, and the inference mask tail."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.config import interactvlm_tiny
from interactvlm_tpu.models.interactvlm import (
    TASK_HCONTACT,
    TASK_OAFFORD,
    TASK_VQA,
    InteractVLM,
    lift_human,
)
from interactvlm_tpu.utils.testing import make_synthetic_batch

MASK = 32  # label mask size for tiny tests


def make_batch(cfg, B=2, L=12, tasks=(TASK_HCONTACT, TASK_OAFFORD)):
    return make_synthetic_batch(cfg, B=B, L=L, tasks=tasks, mask_size=MASK)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = interactvlm_tiny()
    model = InteractVLM(cfg)
    batch = make_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, params


class TestForwardTrain:
    def test_losses_finite_and_structured(self, tiny_model):
        cfg, model, params = tiny_model
        batch = make_batch(cfg)
        out = model.apply(params, batch)
        for k in ("loss", "ce_loss", "mask_bce_loss", "mask_dice_loss",
                  "mask_l2_loss", "hC_loss", "oA_loss"):
            assert np.isfinite(float(out[k])), k
        assert float(out["loss"]) > 0
        assert out["pred_masks"].shape == (2, 4, MASK, MASK)
        # hcontact sample present -> hC loss active; oafford -> l2 + oA
        assert float(out["hC_loss"]) > 0
        assert float(out["oA_loss"]) > 0
        assert float(out["mask_l2_loss"]) > 0

    def test_vqa_only_batch_zeroes_mask_losses(self, tiny_model):
        cfg, model, params = tiny_model
        batch = make_batch(cfg, tasks=(TASK_VQA, TASK_VQA))
        batch["gt_masks"] = jnp.full_like(batch["gt_masks"], -1.0)
        out = model.apply(params, batch)
        assert float(out["mask_bce_loss"]) == 0
        assert float(out["mask_dice_loss"]) == 0
        assert float(out["hC_loss"]) == 0
        assert np.isfinite(float(out["ce_loss"]))

    def test_gradients_respect_freezing(self, tiny_model):
        cfg, model, params = tiny_model
        batch = make_batch(cfg)

        def loss_fn(p):
            return model.apply(p, batch)["loss"]

        g = jax.grad(loss_fn)(params)["params"]
        # frozen: SAM image encoder, CLIP tower
        assert all(
            float(jnp.abs(x).max()) == 0
            for x in jax.tree.leaves(g["sam"]["image_encoder"])
        )
        assert all(
            float(jnp.abs(x).max()) == 0
            for x in jax.tree.leaves(g["llava"]["vision_tower"])
        )
        # trainable: mask decoder, text projection, llama
        assert any(
            float(jnp.abs(x).max()) > 0
            for x in jax.tree.leaves(g["sam"]["mask_decoder"])
        )
        assert any(
            float(jnp.abs(x).max()) > 0
            for x in jax.tree.leaves(g["text_hidden_fcs"])
        )
        assert any(
            float(jnp.abs(x).max()) > 0
            for x in jax.tree.leaves(g["llava"]["lm"])
        )

    def test_jit_compiles(self, tiny_model):
        cfg, model, params = tiny_model
        batch = make_batch(cfg)

        @jax.jit
        def step(p, b):
            return model.apply(p, b)["loss"]

        l1 = step(params, batch)
        l2 = step(params, batch)
        assert np.isclose(float(l1), float(l2))


class TestInferenceTail:
    def test_masks_from_seg_hidden_and_lift(self, tiny_model):
        cfg, model, params = tiny_model
        B, V = 2, cfg.multiview_channels
        rng = np.random.default_rng(1)
        seg_hidden = jnp.asarray(
            rng.normal(size=(B, cfg.llama.hidden_size)).astype(np.float32)
        )
        token_id = jnp.full((B,), cfg.seg_token_idx)
        sam_images = jnp.zeros((B, V, cfg.sam.img_size, cfg.sam.img_size, 3))
        cams = jnp.asarray(rng.random((B, V, 5)).astype(np.float32))
        masks = model.apply(
            params, seg_hidden, token_id, sam_images, cams, MASK,
            method=InteractVLM.masks_from_seg_hidden,
        )
        assert masks.shape == (B, V, MASK, MASK)

        batch = make_batch(cfg)
        contact = lift_human(
            masks, batch["human_p2v"], batch["human_bary"],
            cfg.num_human_vertices,
        )
        assert contact.shape == (B, cfg.num_human_vertices)
        c = np.asarray(contact)
        assert (c >= 0).all() and (c <= 1).all()


class TestDifDeTraining:
    def test_domain_decoders_receive_gradients(self):
        """DifDe training must route per-sample domains so the human and
        object decoders actually train (reference ModifiedSAM.forward
        selects by ds_name, InteractVLM.py:46-54,429-435; previously only
        the default decoder ever saw gradients while eval selected the
        untrained domain decoders)."""
        cfg = interactvlm_tiny(token_type="Gen-DifDe")
        assert cfg.use_diff_decoder
        model = InteractVLM(cfg)
        batch = make_batch(cfg, tasks=(TASK_HCONTACT, TASK_OAFFORD))
        params = model.init(jax.random.PRNGKey(0), batch)

        def loss_fn(p):
            return model.apply(p, batch)["loss"]

        g = jax.grad(loss_fn)(params)["params"]["sam"]
        for name in ("human_mask_decoder", "object_mask_decoder"):
            assert any(
                float(jnp.abs(x).max()) > 0
                for x in jax.tree.leaves(g[name])
            ), f"{name} got no gradient"

    def test_eval_path_uses_matching_decoder(self):
        """masks_from_seg_hidden('hcontact') must hit the SAME decoder the
        hcontact training rows trained."""
        import numpy as np

        cfg = interactvlm_tiny(token_type="Gen-DifDe")
        model = InteractVLM(cfg)
        batch = make_batch(cfg, B=2, tasks=(TASK_HCONTACT, TASK_HCONTACT))
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        hid = jnp.zeros(
            (2, cfg.llama.hidden_size), out["pred_masks"].dtype
        )
        tok = jnp.full((2,), cfg.seg_token_idx, jnp.int32)
        m_h = model.apply(
            params, hid, tok, batch["sam_images"], batch["cam_params"],
            MASK, "hcontact", method=InteractVLM.masks_from_seg_hidden,
        )
        m_def = model.apply(
            params, hid, tok, batch["sam_images"], batch["cam_params"],
            MASK, None, method=InteractVLM.masks_from_seg_hidden,
        )
        # separate decoders -> different random-init outputs
        assert not np.allclose(np.asarray(m_h), np.asarray(m_def))
        # and training's hcontact rows must match the domain decode
        m_train = np.asarray(out["pred_masks"])
        assert m_train.shape == np.asarray(m_h).shape

    def test_training_rows_route_to_their_domain_decoder(self):
        """Perturbing the OBJECT decoder must not change an all-hcontact
        batch's training predictions; perturbing the HUMAN decoder must.
        (Shape checks alone would pass with sel_h/sel_o swapped.)"""
        import numpy as np

        cfg = interactvlm_tiny(token_type="Gen-DifDe")
        model = InteractVLM(cfg)
        batch = make_batch(cfg, B=2, tasks=(TASK_HCONTACT, TASK_HCONTACT))
        params = model.init(jax.random.PRNGKey(0), batch)
        base = np.asarray(model.apply(params, batch)["pred_masks"])

        def perturbed(decoder_name):
            sam = dict(params["params"]["sam"])
            sam[decoder_name] = jax.tree.map(
                lambda x: x + 1.0, sam[decoder_name]
            )
            p = {**params, "params": {**params["params"], "sam": sam}}
            return np.asarray(model.apply(p, batch)["pred_masks"])

        assert np.allclose(perturbed("object_mask_decoder"), base), (
            "object decoder leaked into hcontact rows"
        )
        assert not np.allclose(perturbed("human_mask_decoder"), base), (
            "human decoder is not the one hcontact rows train"
        )
