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

    def test_cached_view_embedding_parity(self, tiny_model):
        """Encode-once serving (hcontact's fixed Vitruvian renders,
        reference hcontact_3d.py:268-271 + frozen encoder
        InteractVLM.py:251): the cached-embedding tail is the same math as
        recomputing the encode per batch. At matching batch shape the
        outputs are BITWISE-identical; the (1, V)->(B, V) broadcast form
        differs only by XLA's batch-dependent reduction tiling in the
        encoder (<=1e-6, last-ulp)."""
        cfg, model, params = tiny_model
        B, V = 3, cfg.multiview_channels
        rng = np.random.default_rng(7)
        seg_hidden = jnp.asarray(
            rng.normal(size=(B, cfg.llama.hidden_size)).astype(np.float32)
        )
        token_id = jnp.full((B,), cfg.seg_token_idx)
        # one shared canonical render set, repeated per sample
        one = jnp.asarray(
            rng.random((1, V, cfg.sam.img_size, cfg.sam.img_size, 3))
            .astype(np.float32)
        )
        sam_images = jnp.broadcast_to(one, (B,) + one.shape[1:])
        cams = jnp.asarray(rng.random((B, V, 5)).astype(np.float32))

        cached_emb = model.apply(
            params, one, method=InteractVLM.encode_sam_images,
        )
        # (a) bitwise at matching encode shape: B=1 streaming vs cached
        stream1 = model.apply(
            params, seg_hidden[:1], token_id[:1], one, cams[:1],
            method=InteractVLM.low_res_masks_from_seg_hidden,
        )
        cached1 = model.apply(
            params, seg_hidden[:1], token_id[:1], cached_emb, cams[:1],
            method=InteractVLM.low_res_masks_from_image_emb,
        )
        np.testing.assert_array_equal(
            np.asarray(cached1), np.asarray(stream1)
        )
        # (b) broadcast serving form at B=3 vs per-batch streaming encode
        streaming = model.apply(
            params, seg_hidden, token_id, sam_images, cams,
            method=InteractVLM.low_res_masks_from_seg_hidden,
        )
        cached = model.apply(
            params, seg_hidden, token_id, cached_emb, cams,
            method=InteractVLM.low_res_masks_from_image_emb,
        )
        assert cached.shape == streaming.shape
        np.testing.assert_allclose(
            np.asarray(cached), np.asarray(streaming),
            rtol=0, atol=1e-5,
        )
        # all broadcast rows saw the identical embedding
        c = np.asarray(cached)
        s = np.asarray(streaming)
        assert np.abs(c - s).max() < 1e-5


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


class TestMultiSegTokens:
    """K seg-token slots per row (reference decodes one mask set per seg
    token in a conversation, InteractVLM.py:389-410 train / :544-576 eval;
    a Gen-Hu-Obj answer can emit both [HSEG] and [OSEG])."""

    @pytest.fixture(scope="class")
    def hu_obj_model(self):
        cfg = interactvlm_tiny(
            token_type="Gen-Hu-Obj-DifDe",
            hseg_token_idx=501, oseg_token_idx=502,
        )
        model = InteractVLM(cfg)
        batch = make_batch(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)
        return cfg, model, params

    def test_seg_embeddings_k_positions_and_slot0_parity(self, hu_obj_model):
        cfg, model, params = hu_obj_model
        L = 10
        ids = np.full((2, L), 7, np.int32)
        # row 0: [HSEG] at 3, [OSEG] at 6; row 1: [SEG] at 2 only
        ids[0, 3] = cfg.hseg_token_idx
        ids[0, 6] = cfg.oseg_token_idx
        ids[1, 2] = cfg.seg_token_idx
        rng = np.random.default_rng(3)
        hidden = jnp.asarray(
            rng.normal(size=(2, L, cfg.llama.hidden_size)).astype(np.float32)
        )
        spliced = jnp.asarray(ids)
        emb_k, tok_k, valid_k = model.apply(
            params, hidden, spliced, 2,
            method=InteractVLM.seg_embeddings_k,
        )
        assert emb_k.shape == (2, 2, cfg.out_dim)
        np.testing.assert_array_equal(
            np.asarray(tok_k)[0], [cfg.hseg_token_idx, cfg.oseg_token_idx]
        )
        assert np.asarray(valid_k).tolist() == [[True, True], [True, False]]
        # slot 0 == the single-token path
        emb1, tok1, has1 = model.apply(
            params, hidden, spliced, method=InteractVLM.seg_embeddings,
        )
        np.testing.assert_array_equal(
            np.asarray(emb_k)[:, 0], np.asarray(emb1)
        )
        np.testing.assert_array_equal(np.asarray(tok_k)[:, 0],
                                      np.asarray(tok1))
        # invalid slot contributes a zero embedding
        assert np.abs(np.asarray(emb_k)[1, 1]).max() == 0

    def test_two_seg_tokens_two_scored_mask_sets(self, hu_obj_model):
        """A Gen-Hu-Obj row emitting [HSEG]+[OSEG] produces TWO mask sets,
        each routed to its domain decoder and scored against its own GT
        (reference per-token semantics, InteractVLM.py:544-576)."""
        cfg, model, params = hu_obj_model
        B, K, V = 2, 2, cfg.multiview_channels
        S = cfg.sam.img_size
        rng = np.random.default_rng(11)
        seg_hidden = jnp.asarray(
            rng.normal(size=(B, K, cfg.llama.hidden_size)).astype(np.float32)
        )
        tok = jnp.asarray([[cfg.hseg_token_idx, cfg.oseg_token_idx],
                           [cfg.hseg_token_idx, 0]], jnp.int32)
        valid = jnp.asarray([[True, True], [True, False]])
        sam_images = jnp.asarray(
            rng.random((B, V, S, S, 3)).astype(np.float32))
        cams = jnp.asarray(rng.random((B, V, 5)).astype(np.float32))
        image_emb = model.apply(
            params, sam_images, method=InteractVLM.encode_sam_images)

        low_k = model.apply(
            params, seg_hidden, tok, valid, image_emb, cams,
            method=InteractVLM.multi_seg_low_res_masks,
        )
        g4 = cfg.sam.image_embedding_size * 4
        assert low_k.shape == (B, K, V, g4, g4)
        # per-slot parity with the single-token path + its domain decoder
        for b, k, domain in ((0, 0, "hcontact"), (0, 1, "ocontact"),
                             (1, 0, "hcontact")):
            single = model.apply(
                params, seg_hidden[b:b + 1, k], tok[b:b + 1, k],
                image_emb[b:b + 1], cams[b:b + 1], domain,
                method=InteractVLM.low_res_masks_from_image_emb,
            )
            np.testing.assert_allclose(
                np.asarray(low_k)[b, k], np.asarray(single)[0],
                rtol=0, atol=1e-5,
            )
        # invalid slot predicts nothing
        assert np.abs(np.asarray(low_k)[1, 1]).max() == 0

        # both mask sets SCORE against their own GT: human slot lifts to
        # vertices, object slot lifts through per-sample maps
        batch = make_batch(cfg)
        masks_k = model.apply(
            params, low_k.reshape(B * K, V, g4, g4), MASK,
            method=InteractVLM.upsample_masks,
        ).reshape(B, K, V, MASK, MASK)
        h3d = lift_human(
            masks_k[:, 0], batch["human_p2v"], batch["human_bary"],
            cfg.num_human_vertices,
        )
        assert h3d.shape == (B, cfg.num_human_vertices)
        from interactvlm_tpu.eval.metrics import contact_f1

        gt_h = np.asarray(batch["gt_hcontact"])
        f1_h = contact_f1(gt_h, np.asarray(h3d))[0]
        assert np.isfinite(f1_h)
        from interactvlm_tpu.geometry.lift import lift_multiview_thresholded

        P = cfg.num_object_points
        # corner-major per-sample maps (3, B, V, H, W); vmap B = axis 1
        obj_p2v = jnp.asarray(np.moveaxis(
            rng.integers(-1, P, (B, V, MASK, MASK, 3)).astype(np.int32),
            -1, 0))
        obj_bary = jnp.asarray(np.moveaxis(
            rng.dirichlet([1, 1, 1], (B, V, MASK, MASK)).astype(np.float32),
            -1, 0))
        o3d = jax.vmap(
            lambda m, p, bb: lift_multiview_thresholded(m, p, bb, P),
            in_axes=(0, 1, 1),
        )(masks_k[:, 1], obj_p2v, obj_bary)
        assert o3d.shape == (B, P)
        assert np.isfinite(np.asarray(o3d)).all()


class TestGenHuObjTraining:
    def test_splitter_heads_receive_gradients_from_mixed_batch(self):
        """The interaction flagship (Gen-Hu-Obj, reference
        run_train.sh:165-199) trains hcontact + ocontact in one mixture;
        the AttentionSplitter's human AND object query heads must both
        receive gradients from a mixed batch (the human head via [HSEG]
        rows' losses, the object head via [OSEG] rows')."""
        from interactvlm_tpu.models.interactvlm import TASK_OCONTACT

        cfg = interactvlm_tiny(
            token_type="Gen-Hu-Obj", cam_encoder_type="vi_v1",
            hseg_token_idx=501, oseg_token_idx=502,
        )
        model = InteractVLM(cfg)
        rng = np.random.default_rng(0)
        batch = make_batch(cfg, tasks=(TASK_HCONTACT, TASK_OCONTACT))
        # rows carry their domain token: row 0 [HSEG], row 1 [OSEG]
        ids = np.asarray(batch["input_ids"]).copy()
        L = ids.shape[1]
        ids[0, L - 2] = cfg.hseg_token_idx
        ids[1, L - 2] = cfg.oseg_token_idx
        batch["input_ids"] = jnp.asarray(ids)
        labels = np.asarray(batch["labels"]).copy()
        labels[0, L - 2] = cfg.hseg_token_idx
        labels[1, L - 2] = cfg.oseg_token_idx
        batch["labels"] = jnp.asarray(labels)
        # ocontact fields (collate's include_object_maps payload)
        P = cfg.num_object_points
        V = cfg.multiview_channels
        batch["gt_ocontact"] = jnp.asarray(
            (rng.random((2, P)) > 0.7).astype(np.float32))
        batch["obj_p2v"] = jnp.asarray(np.moveaxis(
            rng.integers(-1, P, (2, V, MASK, MASK, 3)).astype(np.int32),
            -1, 0))
        batch["obj_bary"] = jnp.asarray(np.moveaxis(
            rng.dirichlet([1, 1, 1], (2, V, MASK, MASK)).astype(np.float32),
            -1, 0))
        batch["obj_valid_verts"] = jnp.ones((2, P), jnp.float32)

        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert float(out["hC_loss"]) > 0
        assert float(out["oC_loss"]) > 0

        def loss_fn(p):
            return model.apply(p, batch)["loss"]

        g = jax.grad(loss_fn)(params)["params"]
        split = g["attention_splitter"]
        h_leaves = jax.tree.leaves(split["query_human"])
        o_leaves = jax.tree.leaves(split["query_object"])
        assert any(float(jnp.abs(x).max()) > 0 for x in h_leaves), (
            "human splitter head got no gradient from the mixed batch")
        assert any(float(jnp.abs(x).max()) > 0 for x in o_leaves), (
            "object splitter head got no gradient from the mixed batch")
        # vi_v1 cam conditioning trains too
        assert any(
            float(jnp.abs(x).max()) > 0
            for x in jax.tree.leaves(g["cam_pose_encoder"])
        )


class TestMultiSegTraining:
    """forward_train with cfg.max_seg_tokens=2: the K-slot path the
    interaction flagship trains through (VERDICT r04 #2; reference trains
    one mask set per seg token, InteractVLM.py:389-410)."""

    def _model(self):
        cfg = interactvlm_tiny(
            token_type="Gen-Hu-Obj-DifDe",
            hseg_token_idx=501, oseg_token_idx=502,
            max_seg_tokens=2,
        )
        model = InteractVLM(cfg)
        batch = make_batch(cfg, tasks=(TASK_HCONTACT, TASK_OAFFORD))
        params = model.init(jax.random.PRNGKey(0), batch)
        return cfg, model, params, batch

    def test_dual_token_row_trains_both_domain_decoders(self):
        """A Gen-Hu-Obj row carrying [HSEG]+[OSEG] produces nonzero
        gradients into BOTH domain decoders' mask losses (r04: the second
        mask's gradient was silently dropped)."""
        cfg, model, params, batch = self._model()
        out = model.apply(params, batch)
        assert out["pred_masks"].shape[:2] == (2, 2)  # (B, K, ...)
        assert np.isfinite(float(out["loss"]))

        def loss_fn(p):
            return model.apply(p, batch)["mask_loss"]

        g = jax.grad(loss_fn)(params)["params"]["sam"]
        for name in ("human_mask_decoder", "object_mask_decoder"):
            assert any(
                float(jnp.abs(x).max()) > 0
                for x in jax.tree.leaves(g[name])
            ), f"{name} got no mask-loss gradient"

    def test_second_slot_gt_changes_the_loss(self):
        """Slot 1's GT must be SUPERVISED: flipping it changes mask_loss
        (catches a K path that decodes two slots but scores only one)."""
        cfg, model, params, batch = self._model()
        base = float(model.apply(params, batch)["mask_loss"])
        flipped = dict(batch)
        gm = np.asarray(batch["gt_masks"]).copy()
        gm[:, 1] = np.where(gm[:, 1] >= 0, 1.0 - gm[:, 1], gm[:, 1])
        flipped["gt_masks"] = jnp.asarray(gm)
        assert float(model.apply(params, flipped)["mask_loss"]) != base

    def test_single_token_rows_match_k1_losses(self):
        """Rows with ONE seg token must produce the same mask/3D losses
        under the K=2 path as under the K=1 path (slot 1 invalid)."""
        cfg1 = interactvlm_tiny(
            token_type="Gen-Hu-Obj-DifDe",
            hseg_token_idx=501, oseg_token_idx=502,
        )
        b1 = make_batch(cfg1, tasks=(TASK_HCONTACT, TASK_OAFFORD))
        cfg2 = interactvlm_tiny(
            token_type="Gen-Hu-Obj-DifDe",
            hseg_token_idx=501, oseg_token_idx=502,
            max_seg_tokens=2,
        )
        model2 = InteractVLM(cfg2)
        b2k = make_batch(cfg2, tasks=(TASK_HCONTACT, TASK_OAFFORD))
        params = model2.init(jax.random.PRNGKey(0), b2k)
        # same K-batch, but demote to single-token rows: replace the
        # [HSEG] with a plain token, leave one seg token per row, and
        # invalidate slot 1's GT
        ids = np.asarray(b2k["input_ids"]).copy()
        L = ids.shape[1]
        tok_kind = [cfg2.hseg_token_idx, cfg2.oseg_token_idx]
        for r in range(ids.shape[0]):
            ids[r, L - 4] = 7
            ids[r, L - 2] = tok_kind[r % 2]
        gm = np.asarray(b2k["gt_masks"]).copy()
        gm[:, 1] = -1.0
        slot = np.asarray(b2k["seg_slot_has_mask"]).copy()
        slot[:, 1] = 0.0
        bk = {**b2k, "input_ids": jnp.asarray(ids),
              "gt_masks": jnp.asarray(gm),
              "seg_slot_has_mask": jnp.asarray(slot)}
        # equivalent K=1 batch
        model1 = InteractVLM(cfg1)
        b1 = {**bk}
        b1["gt_masks"] = bk["gt_masks"][:, 0]
        b1.pop("seg_slot_has_mask")
        out_k = model2.apply(params, bk)
        out_1 = model1.apply(params, b1)
        for key in ("mask_bce_loss", "mask_dice_loss", "mask_l2_loss",
                    "hC_loss", "oA_loss", "ce_loss"):
            np.testing.assert_allclose(
                float(out_k[key]), float(out_1[key]), rtol=1e-5,
                err_msg=key,
            )

    def test_jit_compiles_k_path(self):
        cfg, model, params, batch = self._model()
        out = jax.jit(lambda p, b: model.apply(p, b)["loss"])(params, batch)
        assert np.isfinite(float(out))
