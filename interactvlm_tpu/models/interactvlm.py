"""The composite InteractVLM model: LLaVA -> [SEG] hidden states -> SAM
text-prompted multi-view mask decode -> 2D->3D contact lift + losses.

TPU-native rebuild of ``model/InteractVLM.py:139-637``. The reference's
per-sample Python loops (views, prompts, losses) become fully batched
static-shape computations:

- SAM runs over ``B*V`` folded view-images in one batch (the reference loops
  ``get_visual_embs`` per sample, InteractVLM.py:251-261);
- every view's decoder receives the sample's V cam-conditioned prompt tokens
  (matching the reference's broadcast through torch batching,
  InteractVLM.py:416-435);
- [SEG] hidden-state selection uses the predictor-position mask in spliced
  coordinates (see ``models/llava.py``), replacing boolean indexing;
- losses are indicator-weighted over a mixed-task batch (``models/losses``).

Task encoding for jit-compatible mixed batches (strings in the reference):
VQA=0, plain 2D seg=1 (h2dcontact/refer/reason/semseg), HCONTACT=2,
OAFFORD=3, OCONTACT=4.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from interactvlm_tpu.config import InteractVLMConfig
from interactvlm_tpu.models.components import (
    AttentionSplitter,
    CamPoseEncoder,
    LLaVASAMFusion,
    TextHiddenFcs,
    UncertaintyModule,
    VIv1CamPoseEncoder,
    ViewIndexCamPoseEncoder,
)
from interactvlm_tpu.models.llama import cross_entropy_loss
from interactvlm_tpu.models.llava import LlavaModel, seg_predictor_mask
from interactvlm_tpu.models import losses as L
from interactvlm_tpu.models.sam.sam import Sam
from interactvlm_tpu.geometry.lift import (
    lift_multiview_soft,
    lift_multiview_thresholded,
)

TASK_VQA = 0
TASK_SEG2D = 1
TASK_HCONTACT = 2
TASK_OAFFORD = 3
TASK_OCONTACT = 4


class InteractVLM(nn.Module):
    config: InteractVLMConfig

    def setup(self):
        cfg = self.config
        self.llava = LlavaModel(cfg.llama, cfg.clip)
        self.sam = Sam(cfg.sam, use_diff_decoder=cfg.use_diff_decoder)
        self.text_hidden_fcs = TextHiddenFcs(
            cfg.llama.hidden_size, cfg.out_dim
        )
        if cfg.multiview_cam_cond:
            if cfg.cam_encoder_type == "simple":
                self.cam_pose_encoder = CamPoseEncoder(cfg.out_dim)
            elif cfg.cam_encoder_type == "view_index":
                self.cam_pose_encoder = ViewIndexCamPoseEncoder(
                    cfg.multiview_channels, cfg.out_dim
                )
            elif cfg.cam_encoder_type == "vi_v1":
                self.cam_pose_encoder = VIv1CamPoseEncoder(
                    cfg.multiview_channels, output_dim=cfg.out_dim
                )
            else:
                raise ValueError(cfg.cam_encoder_type)
        if cfg.base_token_type in ("Gen-Hu-Obj", "Gen-Int"):
            self.attention_splitter = AttentionSplitter(cfg.out_dim)
        if cfg.use_fusion:
            self.fusion = LLaVASAMFusion(
                cfg.sam.prompt_embed_dim, cfg.llama.hidden_size
            )
        if cfg.use_uncertainty:
            self.uncertainty = UncertaintyModule()

    # ------------------------------------------------------------------
    def encode_sam_images(self, sam_images):
        """(B, V, S, S, 3) -> (B, V, g, g, C); frozen encoder
        (reference get_visual_embs runs under no_grad, InteractVLM.py:251)."""
        B, V = sam_images.shape[:2]
        flat = sam_images.reshape((B * V,) + sam_images.shape[2:])
        emb = self.sam.encode_image(flat)
        emb = jax.lax.stop_gradient(emb)
        return emb.reshape((B, V) + emb.shape[1:])

    def seg_embeddings(self, hidden, spliced_ids):
        """Project hidden states and pick the (single) seg-token embedding
        per row. Returns (emb (B, out_dim), token_id (B,), has_seg (B,))."""
        cfg = self.config
        seg_ids = [cfg.seg_token_idx]
        if cfg.base_token_type in ("Gen-Hu-Obj", "Gen-Int"):
            seg_ids += [cfg.hseg_token_idx, cfg.oseg_token_idx]
        proj = self.text_hidden_fcs(hidden)  # (B, L, out_dim)
        mask = seg_predictor_mask(spliced_ids, seg_ids)  # (B, L)
        has_seg = jnp.any(mask, axis=1)
        # first marked predictor position
        pos = jnp.argmax(mask, axis=1)
        emb = jnp.take_along_axis(proj, pos[:, None, None], axis=1)[:, 0]
        emb = jnp.where(has_seg[:, None], emb, 0.0)
        token_id = jnp.take_along_axis(
            spliced_ids, jnp.minimum(pos + 1, spliced_ids.shape[1] - 1)[:, None],
            axis=1,
        )[:, 0]
        return emb, token_id, has_seg

    def seg_embeddings_k(self, hidden, spliced_ids, k: int):
        """Up to K seg-token slots per row, in emission order.

        The reference gathers ALL seg tokens per conversation and decodes
        one mask set per token (``model/InteractVLM.py:389-410`` train,
        ``:544-576`` eval) -- a Gen-Hu-Obj / Gen-Int conversation can carry
        both [HSEG] and [OSEG]. Static-shape form: pad to ``k`` slots with
        an indicator (same trick as multiconv's C).

        Returns (emb (B, K, out_dim), token_id (B, K), valid (B, K)).
        """
        cfg = self.config
        seg_ids = [cfg.seg_token_idx]
        if cfg.base_token_type in ("Gen-Hu-Obj", "Gen-Int"):
            seg_ids += [cfg.hseg_token_idx, cfg.oseg_token_idx]
        proj = self.text_hidden_fcs(hidden)  # (B, L, out_dim)
        mask = seg_predictor_mask(spliced_ids, seg_ids)  # (B, L)
        L = mask.shape[1]
        pos_all = jnp.where(mask, jnp.arange(L)[None], L)
        # first K marked positions ascending (top_k of negated positions)
        neg, _ = jax.lax.top_k(-pos_all, k)
        pos = -neg  # (B, K) ascending
        valid = pos < L
        posc = jnp.minimum(pos, L - 1)
        emb = jnp.take_along_axis(proj, posc[..., None], axis=1)
        emb = jnp.where(valid[..., None], emb, 0.0)
        token_id = jnp.take_along_axis(
            spliced_ids, jnp.minimum(posc + 1, L - 1), axis=1
        )
        return emb, token_id, valid

    def multi_seg_low_res_masks(
        self, seg_hidden, token_id, valid, image_emb, cam_params
    ):
        """K mask sets per row, one per seg-token slot (reference decodes a
        mask set per seg token, InteractVLM.py:389-410,544-576; the slots
        fold into the decode batch -- no per-token Python loop).

        seg_hidden: (B, K, llm_hidden) raw hidden states at the predictor
        positions; token_id: (B, K); valid: (B, K) slot indicators;
        image_emb: (B|1, V, g, g, C) frozen-encoder embedding.
        Under DifDe each slot routes to its token's domain decoder
        ([HSEG] -> human, [OSEG] -> object, else default).
        Returns low-res logits (B, K, V, 4g, 4g), invalid slots zeroed.
        """
        cfg = self.config
        B, K = seg_hidden.shape[:2]
        emb = self.text_hidden_fcs(
            seg_hidden.reshape(B * K, seg_hidden.shape[-1])
        )
        if image_emb.shape[0] == 1 and B > 1:
            image_emb = jnp.broadcast_to(
                image_emb, (B,) + image_emb.shape[1:]
            )
        # slot (b, k) -> image b: repeat each image K consecutive times
        emb_flat = jnp.repeat(image_emb, K, axis=0)
        cams_flat = jnp.repeat(cam_params, K, axis=0)
        tok_flat = token_id.reshape(B * K)
        view_tokens = self.condition_views(emb, cams_flat, tok_flat)
        if cfg.use_diff_decoder:
            low_def = self.decode_view_masks(emb_flat, view_tokens)
            low_h = self.decode_view_masks(emb_flat, view_tokens, "hcontact")
            low_o = self.decode_view_masks(emb_flat, view_tokens, "ocontact")
            sel_h = (tok_flat == cfg.hseg_token_idx)[:, None, None, None]
            sel_o = (tok_flat == cfg.oseg_token_idx)[:, None, None, None]
            low = jnp.where(sel_h, low_h, jnp.where(sel_o, low_o, low_def))
        else:
            low = self.decode_view_masks(emb_flat, view_tokens)
        low = low.reshape(B, K, *low.shape[1:])
        return jnp.where(valid[:, :, None, None, None], low, 0.0)

    def condition_views(self, emb, cam_params, token_id):
        """Per-view prompt tokens from one seg embedding
        (reference process_embeddings, InteractVLM.py:268-294).

        emb: (B, D); cam_params: (B, V, 5) normalized. -> (B, V, D)
        """
        cfg = self.config
        V = cfg.multiview_channels
        tokens = jnp.broadcast_to(
            emb[:, None, :], (emb.shape[0], V, emb.shape[-1])
        )
        if cfg.multiview_cam_cond:
            enc = self.cam_pose_encoder(cam_params.astype(emb.dtype))
            if cfg.cam_encoder_type == "simple":
                tokens = tokens + enc
            else:  # view_index / vi_v1 multiply
                tokens = tokens * enc
        if cfg.base_token_type in ("Gen-Hu-Obj", "Gen-Int"):
            human, obj = self.attention_splitter(tokens)
            tokens = jnp.where(
                (token_id == cfg.hseg_token_idx)[:, None, None], human,
                jnp.where(
                    (token_id == cfg.oseg_token_idx)[:, None, None], obj, tokens
                ),
            )
        return tokens

    def decode_view_masks(self, image_emb, view_tokens, domain=None):
        """Batched multi-view mask decode.

        image_emb: (B, V, g, g, C); view_tokens: (B, V, D). Each view's
        decoder gets all V tokens of its sample as sparse prompts (the
        reference broadcast). Returns low-res mask logits (B, V, 4g, 4g).
        """
        B, V = image_emb.shape[:2]
        flat_emb = image_emb.reshape((B * V,) + image_emb.shape[2:])
        # same V-token prompt set for each of the sample's V views
        prompts = jnp.repeat(view_tokens, V, axis=0)  # (B*V, V, D)
        low_res, _ = self.sam.decode_masks(flat_emb, prompts, domain)
        low = low_res[:, 0]
        return low.reshape(B, V, low.shape[-2], low.shape[-1])

    def upsample_masks(self, low_res, out_size: int):
        """Low-res logits (B, V, h, w) -> (B, V, out, out). The canonical
        renders are square and fill the SAM frame, so postprocess reduces to
        one resize (reference sam.py:137-172 with input==img_size)."""
        B, V = low_res.shape[:2]
        return jax.image.resize(
            low_res.astype(jnp.float32), (B, V, out_size, out_size),
            method="bilinear",
        )

    # ------------------------------------------------------------------
    def __call__(self, batch: Dict[str, Any], train: bool = True):
        return self.forward_train(batch)

    def forward_train(self, batch: Dict[str, Any]):
        """Teacher-forced training forward (reference model_forward,
        InteractVLM.py:296-508). Returns the reference's results dict."""
        cfg = self.config
        task_ids = batch["task_ids"]
        is_h = task_ids == TASK_HCONTACT
        is_oa = task_ids == TASK_OAFFORD
        is_oc = task_ids == TASK_OCONTACT
        has_mask = task_ids != TASK_VQA

        # multi-conversation batches (reference offset machinery,
        # InteractVLM.py:392-410): rows are conversations, images_clip /
        # sam_images are compact per-image arrays, image_index gathers
        # each row's encodes -- C classes share one CLIP+SAM encode.
        image_index = batch.get("image_index")
        out = self.llava(
            batch["input_ids"], batch["images_clip"], batch["labels"],
            batch.get("attn_mask"), image_index=image_index,
        )
        ce_loss = cross_entropy_loss(out.logits, out.spliced_labels)
        ce_loss = cfg.ce_loss_weight * ce_loss

        image_emb = self.encode_sam_images(batch["sam_images"])
        if image_index is not None:
            image_emb = jnp.take(image_emb, image_index, axis=0)
        if cfg.use_fusion:
            B, V = image_emb.shape[:2]
            fused = self.fusion(
                image_emb.reshape((B * V,) + image_emb.shape[2:]),
                jnp.repeat(out.hidden, V, axis=0),
            )
            image_emb = fused.reshape(image_emb.shape)

        if cfg.max_seg_tokens > 1:
            return self._forward_train_multiseg(
                batch, out, ce_loss, image_emb, is_h, is_oa, is_oc
            )

        emb, token_id, has_seg = self.seg_embeddings(
            out.hidden, out.spliced_ids
        )
        view_tokens = self.condition_views(
            emb, batch["cam_params"], token_id
        )
        if cfg.use_diff_decoder:
            # per-SAMPLE decoder routing (reference ModifiedSAM.forward
            # selects by ds_name per row, InteractVLM.py:46-54,429-435):
            # hcontact rows -> human decoder, oafford/ocontact -> object,
            # everything else (VQA / 2D seg / h2dcontact) -> default.
            # All three run on every row (static shapes; the decoder is
            # <1% of forward FLOPs) and indicators select. Without this
            # the domain decoders would never receive training gradients
            # while eval/demo select them. Note the reference ALIASES all
            # three decoders to one module at init -- genuinely separate
            # decoders are a deliberate, documented deviation.
            low_def = self.decode_view_masks(image_emb, view_tokens)
            low_h = self.decode_view_masks(
                image_emb, view_tokens, "hcontact"
            )
            low_o = self.decode_view_masks(
                image_emb, view_tokens, "ocontact"
            )
            sel_h = is_h[:, None, None, None]
            sel_o = (is_oa | is_oc)[:, None, None, None]
            low_res = jnp.where(sel_h, low_h, jnp.where(sel_o, low_o,
                                                        low_def))
        else:
            low_res = self.decode_view_masks(image_emb, view_tokens)
        mask_size = batch["gt_masks"].shape[-1]
        pred_masks = self.upsample_masks(low_res, mask_size)
        # rows without a seg token predict nothing
        pred_masks = jnp.where(
            has_seg[:, None, None, None], pred_masks, 0.0
        )

        # oafford heatmap rows: sigmoid the prediction
        # (reference InteractVLM.py:453-456)
        is_heatmap = is_oa
        pred_for_loss = jnp.where(
            is_heatmap[:, None, None, None],
            jax.nn.sigmoid(pred_masks),
            pred_masks,
        )

        mask_bce, mask_dice, mask_l2 = L.combined_mask_losses(
            pred_for_loss,
            batch["gt_masks"],
            is_heatmap,
            has_mask & has_seg,
            cfg.bce_loss_weight,
            cfg.bce_loss_alpha,
            cfg.dice_loss_weight,
            cfg.dice_loss_scale,
        )

        hC = oA = oC = jnp.float32(0.0)
        if cfg.hC_loss_weight > 0 and "human_p2v" in batch:
            hC = cfg.hC_loss_weight * L.human_contact_3d_loss(
                pred_masks, batch["gt_hcontact"],
                batch["human_p2v"], batch["human_bary"],
                is_h, batch["gt_hcontact"].shape[1],
            )
        if cfg.oC_loss_weight > 0 and "obj_p2p" in batch:
            oA = cfg.oC_loss_weight * L.object_afford_3d_loss(
                jax.nn.sigmoid(pred_masks), batch["gt_oafford"],
                batch["obj_p2p"], is_oa,
            )
        if cfg.oC_loss_weight > 0 and "obj_p2v" in batch:
            oC = cfg.oC_loss_weight * L.object_contact_3d_loss(
                pred_masks, batch["gt_ocontact"],
                batch["obj_p2v"], batch["obj_bary"],
                batch["obj_valid_verts"], is_oc,
            )

        mask_loss = mask_bce + mask_dice + mask_l2
        loss = ce_loss + mask_loss + hC + oA + oC
        return {
            "loss": loss,
            "ce_loss": ce_loss,
            "mask_bce_loss": mask_bce,
            "mask_dice_loss": mask_dice,
            "mask_l2_loss": mask_l2,
            "mask_loss": mask_loss,
            "hC_loss": hC,
            "oA_loss": oA,
            "oC_loss": oC,
            "pred_masks": pred_masks,
        }

    def _forward_train_multiseg(
        self, batch, out, ce_loss, image_emb, is_h, is_oa, is_oc
    ):
        """K-seg-token training supervision: one mask set and one loss
        contribution per seg token of a row (reference decodes a mask set
        per token and pairs it positionally with masks_list,
        ``model/InteractVLM.py:389-442``). Slots fold into the decode
        batch -- no per-token Python loop; gt masks arrive as
        (B, K, V, H, W) with a (B, K) ``seg_slot_has_mask`` indicator
        (collate ``max_seg_tokens``)."""
        cfg = self.config
        K = cfg.max_seg_tokens
        B = out.hidden.shape[0]
        emb_k, token_k, valid_k = self.seg_embeddings_k(
            out.hidden, out.spliced_ids, K
        )
        embf = emb_k.reshape(B * K, emb_k.shape[-1])
        tokf = token_k.reshape(B * K)
        camsf = jnp.repeat(batch["cam_params"], K, axis=0)
        view_tokens = self.condition_views(embf, camsf, tokf)
        image_embf = jnp.repeat(image_emb, K, axis=0)

        # per-slot domain routing: with distinct [HSEG]/[OSEG] ids route by
        # the slot's TOKEN (the reference selects the decoder per decoded
        # token / ds_name, InteractVLM.py:429-435); with shared ids
        # (Gen / Gen-Int's [ISEG]) fall back to the row's task.
        distinct = (
            cfg.base_token_type == "Gen-Hu-Obj"
            and cfg.hseg_token_idx != cfg.oseg_token_idx
        )
        if distinct:
            sh = token_k == cfg.hseg_token_idx
            so = token_k == cfg.oseg_token_idx
            slot_h = valid_k & (sh | (is_h[:, None] & ~so))
            slot_oa = valid_k & is_oa[:, None] & ~sh
            slot_oc = valid_k & is_oc[:, None] & ~sh
        else:
            slot_h = valid_k & is_h[:, None]
            slot_oa = valid_k & is_oa[:, None]
            slot_oc = valid_k & is_oc[:, None]

        if cfg.use_diff_decoder:
            low_def = self.decode_view_masks(image_embf, view_tokens)
            low_hd = self.decode_view_masks(
                image_embf, view_tokens, "hcontact"
            )
            low_od = self.decode_view_masks(
                image_embf, view_tokens, "ocontact"
            )
            sel_h = slot_h.reshape(B * K)[:, None, None, None]
            sel_o = (slot_oa | slot_oc).reshape(B * K)[:, None, None, None]
            low = jnp.where(sel_h, low_hd, jnp.where(sel_o, low_od, low_def))
        else:
            low = self.decode_view_masks(image_embf, view_tokens)

        gt = batch["gt_masks"]  # (B, K, V, H, W)
        mask_size = gt.shape[-1]
        pred = self.upsample_masks(low, mask_size)  # (B*K, V, H, W)
        validf = valid_k.reshape(B * K)
        pred = jnp.where(validf[:, None, None, None], pred, 0.0)

        is_heatmap = slot_oa.reshape(B * K)
        pred_for_loss = jnp.where(
            is_heatmap[:, None, None, None], jax.nn.sigmoid(pred), pred
        )
        slot_gt = batch["seg_slot_has_mask"].astype(bool)  # (B, K)
        has_mask_f = (valid_k & slot_gt).reshape(B * K)
        mask_bce, mask_dice, mask_l2 = L.combined_mask_losses(
            pred_for_loss,
            gt.reshape((B * K,) + gt.shape[2:]),
            is_heatmap,
            has_mask_f,
            cfg.bce_loss_weight,
            cfg.bce_loss_alpha,
            cfg.dice_loss_weight,
            cfg.dice_loss_scale,
            n_rows=B,  # reference normalizes per ROW, not per token
        )

        pred_k = pred.reshape((B, K) + pred.shape[1:])
        wh = slot_h.astype(pred.dtype)[..., None, None, None]
        wo = (slot_oa | slot_oc).astype(pred.dtype)[..., None, None, None]
        # <=1 human and <=1 object slot per K=2 Gen-Hu-Obj row: the sum
        # SELECTS that slot's prediction for the row-level 3D lift losses
        pred_h_row = (pred_k * wh).sum(axis=1)
        pred_o_row = (pred_k * wo).sum(axis=1)
        # 3D GT is a per-ROW field routed by the row's task (collate fills
        # gt_hcontact/gt_oafford/gt_ocontact by task id), so the 3D losses
        # keep task routing and additionally require the matching slot
        row_h = is_h & jnp.any(slot_h, axis=1)
        row_oa = is_oa & jnp.any(slot_oa, axis=1)
        row_oc = is_oc & jnp.any(slot_oc, axis=1)

        hC = oA = oC = jnp.float32(0.0)
        if cfg.hC_loss_weight > 0 and "human_p2v" in batch:
            hC = cfg.hC_loss_weight * L.human_contact_3d_loss(
                pred_h_row, batch["gt_hcontact"],
                batch["human_p2v"], batch["human_bary"],
                row_h, batch["gt_hcontact"].shape[1],
            )
        if cfg.oC_loss_weight > 0 and "obj_p2p" in batch:
            oA = cfg.oC_loss_weight * L.object_afford_3d_loss(
                jax.nn.sigmoid(pred_o_row), batch["gt_oafford"],
                batch["obj_p2p"], row_oa,
            )
        if cfg.oC_loss_weight > 0 and "obj_p2v" in batch:
            oC = cfg.oC_loss_weight * L.object_contact_3d_loss(
                pred_o_row, batch["gt_ocontact"],
                batch["obj_p2v"], batch["obj_bary"],
                batch["obj_valid_verts"], row_oc,
            )

        mask_loss = mask_bce + mask_dice + mask_l2
        loss = ce_loss + mask_loss + hC + oA + oC
        return {
            "loss": loss,
            "ce_loss": ce_loss,
            "mask_bce_loss": mask_bce,
            "mask_dice_loss": mask_dice,
            "mask_l2_loss": mask_l2,
            "mask_loss": mask_loss,
            "hC_loss": hC,
            "oA_loss": oA,
            "oC_loss": oC,
            "pred_masks": pred_k,
        }

    # ------------------------------------------------------------------
    def low_res_masks_from_image_emb(
        self,
        seg_hidden,
        token_id,
        image_emb,
        cam_params,
        domain: Optional[str] = None,
    ):
        """Inference tail from a PRECOMPUTED SAM image embedding.

        The hcontact flagship's SAM inputs are the four FIXED canonical
        Vitruvian renders shared by every sample (reference loads them once
        per dataset, ``datasets/hcontact_3d.py:268-271``) and the encoder is
        frozen (``get_visual_embs`` runs under no_grad, InteractVLM.py:251),
        so the (V, g, g, C) embedding is a constant: encode once at load
        time and serve every batch from it (bitwise-identical outputs,
        tests/test_interactvlm.py::test_cached_view_embedding_parity).
        Object tasks render per sample and keep the streaming encode path.

        image_emb: (B, V, g, g, C) or (1, V, g, g, C) broadcast over B.
        """
        emb = self.text_hidden_fcs(seg_hidden)
        view_tokens = self.condition_views(emb, cam_params, token_id)
        B = seg_hidden.shape[0]
        if image_emb.shape[0] == 1 and B > 1:
            image_emb = jnp.broadcast_to(
                image_emb, (B,) + image_emb.shape[1:]
            )
        return self.decode_view_masks(image_emb, view_tokens, domain)

    def low_res_masks_from_seg_hidden(
        self,
        seg_hidden,
        token_id,
        sam_images,
        cam_params,
        domain: Optional[str] = None,
    ):
        """Inference tail up to the low-res decoder logits (B, V, 4g, 4g).

        Real-photo 2D tasks (h2dcontact / refer-seg) postprocess these with
        the crop-pad-then-resize-to-original path (``models/sam/sam.py:
        postprocess_masks``, reference sam.py:137-172) instead of the square
        canonical-render resize."""
        image_emb = self.encode_sam_images(sam_images)
        return self.low_res_masks_from_image_emb(
            seg_hidden, token_id, image_emb, cam_params, domain
        )

    def masks_from_seg_hidden(
        self,
        seg_hidden,
        token_id,
        sam_images,
        cam_params,
        mask_size: int,
        domain: Optional[str] = None,
    ):
        """Inference tail shared by evaluate/demo: one projected seg hidden
        state per sample -> multi-view mask logits at ``mask_size``."""
        low_res = self.low_res_masks_from_seg_hidden(
            seg_hidden, token_id, sam_images, cam_params, domain
        )
        return self.upsample_masks(low_res, mask_size)


def lift_human(pred_masks, p2v3, bary3, num_vertices: int):
    """(B, V, H, W) logits -> (B, N) contact probs (evaluate path).
    Maps are corner-major (3, V, H, W), shared across the batch."""
    return jax.vmap(
        lambda m: lift_multiview_soft(m, p2v3, bary3, num_vertices)
    )(pred_masks)


def lift_object(pred_masks, p2v3, bary3, num_vertices: int, threshold=0.3):
    """Shared corner-major (3, V, H, W) maps (demo object path)."""
    return jax.vmap(
        lambda m: lift_multiview_thresholded(
            m, p2v3, bary3, num_vertices, threshold)
    )(pred_masks)
