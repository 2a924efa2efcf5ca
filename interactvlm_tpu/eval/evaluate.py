"""Evaluation driver: generate-mode validation + DAMON contact reports.

Rebuild of the reference ``evaluate.py``:
- ``evaluate_batch`` mirrors ``model.evaluate`` (InteractVLM.py:510-637):
  truncate the prompt at the answer start (evaluate.py:88-92), greedy-decode
  with hidden capture, gather the first emitted seg token's predictor
  hidden state, run the SAM decode tail, lift to 3D;
- ``validate`` accumulates IoU / contact-F1 / geodesic / affordance meters
  (evaluate.py:41-248);
- ``damon_semantic_contact`` / ``damon_binary_contact`` reproduce the
  post-hoc DAMON analyses (evaluate.py:355-468), returning dicts.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from interactvlm_tpu.eval import metrics as M
from interactvlm_tpu.geometry.views import DAMON_CATEGORIES_MAPPING
from interactvlm_tpu.models.generate import greedy_generate
from interactvlm_tpu.models.interactvlm import (
    InteractVLM,
    lift_human,
    lift_object,
)
from interactvlm_tpu.utils.constants import IGNORE_INDEX
from interactvlm_tpu.utils.meters import AverageMeter, Summary


def truncate_at_answer(
    input_ids: np.ndarray, labels: np.ndarray, pad_id: int = 0
):
    """Cut each row's prompt right before its first supervised token
    (reference evaluate.py:88-92, generalized per-row so ragged batches
    are correct at B > 1).

    Returns (ids (B, W), attn_mask (B, W)) right-padded to the widest row.
    """
    B, L = input_ids.shape
    starts = []
    for b in range(B):
        pos = np.nonzero(labels[b] != IGNORE_INDEX)[0]
        starts.append(int(pos[0]) if pos.size > 0 else L)
    width = max(starts)
    out = np.full((B, width), pad_id, dtype=input_ids.dtype)
    mask = np.zeros((B, width), dtype=np.int32)
    for b, s in enumerate(starts):
        out[b, :s] = input_ids[b, :s]
        mask[b, :s] = 1
    return out, mask


def evaluate_batch(
    model: InteractVLM,
    params,
    batch: Dict,
    cfg,
    mask_size: int,
    contact_type: str = "hcontact",
    max_new_tokens: int = 32,
    human_maps: Optional[Dict] = None,
    object_maps: Optional[Dict] = None,
    eos_id: int = 2,
    kv_cache: str = "dense",
    meta: Optional[Dict] = None,
    cached_image_emb=None,
    max_seg_tokens: int = 1,
):
    """Generate-mode inference for one batch. Returns dict with
    generated_ids, pred_masks (B, V, H, W), pred_contact_3d (B, N), and --
    when ``meta`` carries resize/label lists -- ``pred_masks_original``
    (per-sample original-frame masks for 2D tasks).

    ``cached_image_emb``: precomputed frozen-encoder embedding of the FIXED
    canonical view renders ((1, V, g, g, C), broadcast over the batch) --
    valid only when every sample shares the same ``sam_images`` (hcontact's
    Vitruvian renders, reference hcontact_3d.py:268-271). Skips the SAM
    ViT encode, which dominates eval cost (~81% of e2e at ViT-H).

    ``max_seg_tokens`` (K) > 1 decodes one mask set per emitted seg token
    (reference InteractVLM.py:544-576: a Gen-Hu-Obj / Gen-Int answer can
    carry both [HSEG] and [OSEG]); adds ``pred_masks_k`` (B, K, V, H, W),
    ``token_ids_k``, ``valid_k``, and per-slot 3D lifts routed by token id
    (``pred_hcontact_3d`` from [HSEG]/[SEG] slots, ``pred_ocontact_3d``
    from [OSEG] slots when object maps ride the batch)."""
    from interactvlm_tpu.models.llava import LlavaModel

    input_ids, attn_mask = truncate_at_answer(
        np.asarray(batch["input_ids"]), np.asarray(batch["labels"])
    )
    llava = LlavaModel(cfg.llama, cfg.clip)
    gen = greedy_generate(
        llava, {"params": params["params"]["llava"]},
        jnp.asarray(input_ids), batch["images_clip"],
        max_new_tokens=max_new_tokens, eos_id=eos_id,
        attn_mask=jnp.asarray(attn_mask), kv_cache=kv_cache,
    )
    gen_ids = np.asarray(gen["generated_ids"])

    seg_ids = [cfg.seg_token_idx]
    if cfg.base_token_type in ("Gen-Hu-Obj", "Gen-Int"):
        seg_ids += [cfg.hseg_token_idx, cfg.oseg_token_idx]
    B = gen_ids.shape[0]
    is_seg = np.isin(gen_ids, seg_ids)
    has_seg = is_seg.any(axis=1)
    first = np.where(has_seg, is_seg.argmax(axis=1), 0)
    step_hidden = np.asarray(gen["step_hidden"])
    seg_hidden = step_hidden[np.arange(B), first]  # predictor hidden
    token_id = gen_ids[np.arange(B), first]

    if max_seg_tokens > 1:
        return _evaluate_batch_multiseg(
            model, params, batch, cfg, mask_size, gen_ids, is_seg,
            step_hidden, has_seg, max_seg_tokens, human_maps, object_maps,
            cached_image_emb, contact_type,
        )

    # one SAM-tail pass: low-res decoder logits, upsampled for the square
    # path; the original-frame path reuses the SAME low-res tensor (the
    # ViT encode of B*V views dominates eval cost -- never run it twice)
    if cached_image_emb is not None:
        low = model.apply(
            params, jnp.asarray(seg_hidden), jnp.asarray(token_id),
            cached_image_emb, batch["cam_params"], contact_type,
            method=InteractVLM.low_res_masks_from_image_emb,
        )
    else:
        low = model.apply(
            params, jnp.asarray(seg_hidden), jnp.asarray(token_id),
            batch["sam_images"], batch["cam_params"], contact_type,
            method=InteractVLM.low_res_masks_from_seg_hidden,
        )
    pred_masks = model.apply(
        params, low, mask_size, method=InteractVLM.upsample_masks
    )
    pred_masks = jnp.where(
        jnp.asarray(has_seg)[:, None, None, None], pred_masks, 0.0
    )

    # original-frame masks for real-photo 2D tasks (h2dcontact/refer-seg):
    # crop the pad then resize to each sample's original size
    # (reference sam.py:137-172); sizes vary per sample -> host loop.
    pred_masks_original = None
    if meta is not None and "resize_list" in meta and "label_list" in meta:
        from interactvlm_tpu.models.sam.sam import postprocess_masks
        pred_masks_original = []
        for b in range(B):
            orig = np.asarray(meta["label_list"][b]).shape[:2]
            out = postprocess_masks(
                low[b : b + 1, :1], cfg.sam.img_size,
                tuple(meta["resize_list"][b]), tuple(orig),
            )
            pred_masks_original.append(
                np.asarray(out)[0, 0] * float(has_seg[b])
            )

    pred_contact_3d = None
    if "hcontact" in contact_type and human_maps is not None:
        pred_contact_3d = lift_human(
            pred_masks, human_maps["p2v"], human_maps["bary"],
            int(human_maps.get("num_vertices", cfg.num_human_vertices)),
        )
    elif "oafford" in contact_type and "obj_p2p" in batch:
        # PER-SAMPLE pixel->point maps ride the batch (reference loads
        # p2pmap npz per sample, components.py:309,318-347); the lift
        # averages sigmoid heatmap values per point per visible view
        import jax

        from interactvlm_tpu.geometry.lift import lift_multiview_points

        probs = jax.nn.sigmoid(pred_masks)
        pred_contact_3d = jax.vmap(
            lambda m, p: lift_multiview_points(
                m, p, cfg.num_object_points
            )
        )(probs, batch["obj_p2p"])
    elif "ocontact" in contact_type and "obj_p2v" in batch:
        # per-sample mesh lift maps, thresholded at 0.3
        # (reference components.py:350-489, run_demo.py:493)
        import jax

        from interactvlm_tpu.geometry.lift import (
            lift_multiview_thresholded,
        )

        n_out = batch["gt_ocontact"].shape[1]
        # per-sample corner-major maps (3, B, V, H, W): vmap over B = axis 1
        pred_contact_3d = jax.vmap(
            lambda m, p, b: lift_multiview_thresholded(m, p, b, n_out),
            in_axes=(0, 1, 1),
        )(pred_masks, batch["obj_p2v"], batch["obj_bary"])
    elif object_maps is not None:
        # demo path: one shared lift2d dict for the object
        # (reference InteractVLM.py:624-628)
        pred_contact_3d = lift_object(
            pred_masks, object_maps["p2v"], object_maps["bary"],
            int(object_maps.get("num_vertices", cfg.num_object_points)),
        )
    if pred_contact_3d is not None:
        # rows that emitted no seg token predict nothing (the reference
        # gates the lift on non-empty pred_masks, InteractVLM.py:621)
        pred_contact_3d = jnp.where(
            jnp.asarray(has_seg)[:, None], pred_contact_3d, 0.0
        )

    return {
        "generated_ids": gen_ids,
        "pred_masks": np.asarray(pred_masks),
        "pred_masks_original": pred_masks_original,
        "pred_contact_3d": (
            np.asarray(pred_contact_3d) if pred_contact_3d is not None else None
        ),
        "has_seg": has_seg,
    }


def _evaluate_batch_multiseg(
    model, params, batch, cfg, mask_size, gen_ids, is_seg, step_hidden,
    has_seg, K, human_maps, object_maps, cached_image_emb, contact_type,
):
    """K-seg-token decode: one mask set per emitted seg token (reference
    InteractVLM.py:544-576 loops the seg tokens of each generated answer;
    here the slots fold into the decode batch).

    Slot routing by token id: [HSEG] (or plain [SEG]) slots lift through
    the human maps, [OSEG] slots through per-sample object maps."""
    import jax

    B = gen_ids.shape[0]
    seg_h_k = np.zeros((B, K, step_hidden.shape[-1]), step_hidden.dtype)
    tok_k = np.zeros((B, K), gen_ids.dtype)
    valid_k = np.zeros((B, K), bool)
    for b in range(B):
        pos = np.nonzero(is_seg[b])[0][:K]
        seg_h_k[b, : len(pos)] = step_hidden[b, pos]
        tok_k[b, : len(pos)] = gen_ids[b, pos]
        valid_k[b, : len(pos)] = True

    image_emb = cached_image_emb
    if image_emb is None:
        image_emb = model.apply(
            params, batch["sam_images"], method=InteractVLM.encode_sam_images
        )
    low_k = model.apply(
        params, jnp.asarray(seg_h_k), jnp.asarray(tok_k),
        jnp.asarray(valid_k), image_emb, batch["cam_params"],
        method=InteractVLM.multi_seg_low_res_masks,
    )  # (B, K, V, h, w)
    V = low_k.shape[2]
    pred_k = model.apply(
        params, low_k.reshape(B * K, V, *low_k.shape[3:]), mask_size,
        method=InteractVLM.upsample_masks,
    ).reshape(B, K, V, mask_size, mask_size)
    pred_k_np = np.asarray(pred_k)

    # per-row slot selection by token id
    human_ids = {cfg.seg_token_idx, cfg.hseg_token_idx}
    is_h_slot = np.isin(tok_k, list(human_ids)) & valid_k
    is_o_slot = (tok_k == cfg.oseg_token_idx) & valid_k
    h_slot = np.where(is_h_slot.any(1), is_h_slot.argmax(1), 0)
    o_slot = np.where(is_o_slot.any(1), is_o_slot.argmax(1), 0)

    pred_h3d = pred_o3d = None
    if human_maps is not None and is_h_slot.any():
        masks_h = jnp.asarray(pred_k_np[np.arange(B), h_slot])
        pred_h3d = np.asarray(lift_human(
            masks_h, human_maps["p2v"], human_maps["bary"],
            int(human_maps.get("num_vertices", cfg.num_human_vertices)),
        )) * is_h_slot.any(1)[:, None]
    if is_o_slot.any():
        masks_o = jnp.asarray(pred_k_np[np.arange(B), o_slot])
        if "obj_p2v" in batch:
            from interactvlm_tpu.geometry.lift import (
                lift_multiview_thresholded,
            )

            n_out = (batch["gt_ocontact"].shape[1]
                     if "gt_ocontact" in batch else cfg.num_object_points)
            pred_o3d = np.asarray(jax.vmap(
                lambda m, p, b: lift_multiview_thresholded(m, p, b, n_out),
                in_axes=(0, 1, 1),
            )(masks_o, batch["obj_p2v"], batch["obj_bary"]))
        elif object_maps is not None:
            pred_o3d = np.asarray(lift_object(
                masks_o, object_maps["p2v"], object_maps["bary"],
                int(object_maps.get("num_vertices", cfg.num_object_points)),
            ))
        if pred_o3d is not None:
            pred_o3d = pred_o3d * is_o_slot.any(1)[:, None]

    # back-compat single-token fields: the first emitted seg token's set
    first_slot = np.zeros(B, np.int64)
    pred_masks = pred_k_np[np.arange(B), first_slot] * has_seg[
        :, None, None, None
    ].astype(pred_k_np.dtype)
    if "hcontact" in contact_type:
        pred_contact_3d = pred_h3d
    else:
        pred_contact_3d = pred_o3d
    return {
        "generated_ids": gen_ids,
        "pred_masks": pred_masks,
        "pred_masks_original": None,
        "pred_masks_k": pred_k_np,
        "token_ids_k": tok_k,
        "valid_k": valid_k,
        "pred_hcontact_3d": pred_h3d,
        "pred_ocontact_3d": pred_o3d,
        "pred_contact_3d": pred_contact_3d,
        "has_seg": has_seg,
    }


def shard_eval_batches(batch_iter, mesh):
    """Distributed evaluation, TPU-native form.

    The reference shards the val set with a DistributedSampler and
    all-gathers predictions over NCCL (evaluate.py:202-222,346). Under a
    single-controller JAX mesh the same thing is SPMD: each global batch's
    arrays are placed sharded over the ``data`` axis, the jit-compiled model
    partitions automatically, and host-side numpy reads gather the global
    result -- so the meter math needs no collective at all.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_data = mesh.shape["data"]

    def place(batch):
        def one(leaf):
            if (
                hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) > 0
                and leaf.shape[0] % n_data == 0 and leaf.shape[0] >= n_data
            ):
                return jax.device_put(
                    jnp.asarray(leaf), NamedSharding(mesh, P("data"))
                )
            return jax.device_put(
                jnp.asarray(leaf), NamedSharding(mesh, P())
            )

        return {k: one(v) for k, v in batch.items()}

    for batch, meta in batch_iter:
        yield place(batch), meta


def validate(
    batch_iter,
    model,
    params,
    cfg,
    ds_name: str,
    mask_size: int,
    inference_type: str = "generate",
    human_maps: Optional[Dict] = None,
    object_maps: Optional[Dict] = None,
    dist_matrix: Optional[np.ndarray] = None,
    max_batches: Optional[int] = None,
    kv_cache: str = "dense",
    mesh=None,
    cache_view_encode: Optional[bool] = None,
    max_new_tokens: Optional[int] = None,
    max_seg_tokens: Optional[int] = None,
):
    """Run the eval loop; returns (metrics dict, saved_results for DAMON
    reports). Pass ``mesh`` to shard every batch over the ``data`` axis
    (distributed eval; see ``shard_eval_batches``).

    ``cache_view_encode``: encode the canonical view renders ONCE and reuse
    the frozen-encoder embedding for every batch (valid when all samples
    share fixed renders -- hcontact's Vitruvian views). Default (None):
    auto-on for hcontact, off for per-sample-render object tasks.

    ``max_new_tokens``: generation budget per answer; None = 512 like the
    reference eval (evaluate.py:104). With the ``parts`` answer template a
    real answer can exceed 32 tokens -- a short budget silently drops the
    seg token and collapses every mask metric (watch ``seg_rate``).

    ``max_seg_tokens``: K seg-token slots decoded per answer; None = the
    model config's ``max_seg_tokens`` (2 for Gen-Hu-Obj/Gen-Int)."""
    if max_new_tokens is None:
        max_new_tokens = 512  # reference evaluate.py:104
    if max_seg_tokens is None:
        max_seg_tokens = int(getattr(cfg, "max_seg_tokens", 1) or 1)
    if mesh is not None:
        batch_iter = shard_eval_batches(batch_iter, mesh)
    inter_m = AverageMeter("Intersec", summary_type=Summary.SUM)
    union_m = AverageMeter("Union", summary_type=Summary.SUM)
    giou_m = AverageMeter("gIoU")
    f1_m = AverageMeter("F1")
    prec_m = AverageMeter("Prec")
    rec_m = AverageMeter("Rec")
    geo_m = AverageMeter("Geo")
    seg_m = AverageMeter("SegRate")
    sim_m = AverageMeter("SIM")
    mae_m = AverageMeter("MAE")
    auc_m = AverageMeter("AUC")
    aiou_m = AverageMeter("aIoU")

    saved = {"imgnames": [], "pred": [], "gt": [], "f1": [], "geo": [],
             "objnames": []}

    is_h = "hcontact" in ds_name and "h2d" not in ds_name
    is_oa = "oafford" in ds_name
    is_oc = "ocontact" in ds_name
    # real-photo 2D segmentation: score in the ORIGINAL image frame
    # (reference validate scores postprocessed masks vs the label)
    is_2d = any(k in ds_name for k in
                ("h2dcontact", "refer_seg", "reason_seg", "sem_seg"))
    if cache_view_encode is None:
        cache_view_encode = is_h  # fixed canonical renders (see docstring)
    cached_emb = None

    for bi, (batch, meta) in enumerate(batch_iter):
        if max_batches is not None and bi >= max_batches:
            break
        if cache_view_encode and cached_emb is None:
            # frozen encoder + identical per-sample renders => constant.
            # Encode one sample's V views and broadcast over every batch.
            cached_emb = model.apply(
                params, batch["sam_images"][:1],
                method=InteractVLM.encode_sam_images,
            )
        if inference_type == "generate":
            out = evaluate_batch(
                model, params, batch, cfg, mask_size,
                contact_type=ds_name,
                max_new_tokens=max_new_tokens,
                human_maps=human_maps, object_maps=object_maps,
                kv_cache=kv_cache,
                meta=meta if is_2d else None,
                cached_image_emb=cached_emb,
                max_seg_tokens=max_seg_tokens,
            )
            pred_masks = out["pred_masks"]
            pred_3d = out["pred_contact_3d"]
            # fraction of rows that emitted a seg token: the first thing
            # to check when generate-mode metrics come back zero
            seg_m.update(float(np.mean(out["has_seg"])))
            if is_2d and out["pred_masks_original"] is not None:
                for b, pm in enumerate(out["pred_masks_original"]):
                    gt = np.asarray(meta["label_list"][b])
                    i, u, acc = M.segmentation_metrics(pm[None], gt[None])
                    inter_m.update(i)
                    union_m.update(u)
                    giou_m.update(acc)
                continue
        else:
            fwd = model.apply(params, batch)
            pred_masks = np.asarray(fwd["pred_masks"])
            pred_3d = None
            if is_h and human_maps is not None:
                pred_3d = np.asarray(lift_human(
                    jnp.asarray(pred_masks), human_maps["p2v"],
                    human_maps["bary"], cfg.num_human_vertices,
                ))
            elif is_oa and "obj_p2p" in batch:
                import jax

                from interactvlm_tpu.geometry.lift import (
                    lift_multiview_points,
                )

                pred_3d = np.asarray(jax.vmap(
                    lambda m, p: lift_multiview_points(
                        m, p, cfg.num_object_points
                    )
                )(jax.nn.sigmoid(jnp.asarray(pred_masks)),
                  batch["obj_p2p"]))
            elif is_oc and "obj_p2v" in batch:
                import jax

                from interactvlm_tpu.geometry.lift import (
                    lift_multiview_thresholded,
                )

                n_out = np.asarray(batch["gt_ocontact"]).shape[1]
                pred_3d = np.asarray(jax.vmap(
                    lambda m, p, b: lift_multiview_thresholded(
                        m, p, b, n_out
                    ),
                    in_axes=(0, 1, 1),
                )(jnp.asarray(pred_masks), batch["obj_p2v"],
                  batch["obj_bary"]))

        gt_masks = np.asarray(batch["gt_masks"])
        if gt_masks.ndim == 5:
            # K-slot training batches (collate max_seg_tokens>1): score
            # the back-compat first-token pred against slot 0's GT
            gt_masks = gt_masks[:, 0]
        for b in range(pred_masks.shape[0]):
            i, u, acc = M.segmentation_metrics(pred_masks[b], gt_masks[b])
            inter_m.update(i)
            union_m.update(u)
            giou_m.update(acc)

        if is_h and pred_3d is not None:
            gt3d = np.asarray(batch["gt_hcontact"])
            f1, p, r = M.contact_f1(gt3d, pred_3d)
            f1_m.update(f1)
            prec_m.update(p)
            rec_m.update(r)
            if dist_matrix is not None:
                geo, _ = M.geodesic_contact_errors(pred_3d, gt3d, dist_matrix)
                geo_m.update(geo)
            for b in range(pred_3d.shape[0]):
                saved["imgnames"].append([meta["image_paths"][b]])
                saved["pred"].append(pred_3d[b] >= 0.5)
                saved["gt"].append(gt3d[b] > 0)
                saved["f1"].append(
                    M.contact_f1(gt3d[b : b + 1], pred_3d[b : b + 1])[0]
                )
                # PER-SAMPLE geodesic FP distance (reference stores it per
                # image for the DAMON reports, eval_utils.py:127-151; a
                # batch mean here skews per-object tables)
                geo_b = 0.0
                if dist_matrix is not None:
                    geo_b, _ = M.geodesic_contact_errors(
                        pred_3d[b : b + 1], gt3d[b : b + 1], dist_matrix
                    )
                saved["geo"].append(geo_b)
                saved["objnames"].append(
                    [[meta["sampled_classes_list"][b][0]
                      if meta["sampled_classes_list"][b] else "unknown"]]
                )
        if is_oa and pred_3d is not None:
            gt3d = np.asarray(batch["gt_oafford"])
            sim, mae, auc, aiou, _ = M.affordance_metrics(gt3d, pred_3d)
            sim_m.update(sim)
            mae_m.update(mae)
            auc_m.update(auc)
            aiou_m.update(aiou)
        if is_oc:
            if "gt_ocontact" not in batch:
                # never silently score object contact against human GT
                import warnings

                warnings.warn(
                    "ocontact batch lacks gt_ocontact; skipping F1 "
                    "(enable include_object_maps in collate)"
                )
            elif pred_3d is not None:
                gt3d = np.asarray(batch["gt_ocontact"])
                f1, p, r = M.contact_f1(gt3d, pred_3d)
                f1_m.update(f1)
                prec_m.update(p)
                rec_m.update(r)

    iou_class = np.asarray(inter_m.sum) / (np.asarray(union_m.sum) + 1e-10)
    results = {
        "giou": float(np.asarray(giou_m.avg).reshape(-1)[-1]),
        "ciou": float(iou_class.reshape(-1)[-1]),
    }
    if seg_m.count:
        results["seg_rate"] = float(seg_m.avg)
    if is_h or is_oc:
        results.update(
            f1=float(f1_m.avg), precision=float(prec_m.avg),
            recall=float(rec_m.avg), geo=float(geo_m.avg),
        )
    if is_oa:
        results.update(
            sim=float(sim_m.avg), mae=float(mae_m.avg),
            auc=float(auc_m.avg), aiou=float(aiou_m.avg),
        )
    return results, saved


def damon_binary_contact(saved: Dict, threshold: float = 0.5) -> Dict:
    """Image-wise union of per-object contacts -> binary F1
    (reference evaluate.py:427-468)."""
    imgwise = {}
    for i, name in enumerate(saved["imgnames"]):
        key = name[0]
        pred = np.asarray(saved["pred"][i]).astype(bool)
        gt = np.asarray(saved["gt"][i]).astype(bool)
        if key not in imgwise:
            imgwise[key] = {"pred": pred, "gt": gt, "geo": saved["geo"][i]}
        else:
            imgwise[key]["pred"] |= pred
            imgwise[key]["gt"] |= gt
            imgwise[key]["geo"] = max(imgwise[key]["geo"], saved["geo"][i])

    f1s, geos = [], []
    tp = pred_pos = gt_pos = 0
    for v in imgwise.values():
        tpi = np.sum(v["pred"] & v["gt"])
        ppi = np.sum(v["pred"])
        gpi = np.sum(v["gt"])
        prec = tpi / ppi if ppi else 0
        rec = tpi / gpi if gpi else 0
        f1s.append(2 * prec * rec / (prec + rec) if (prec + rec) else 0)
        geos.append(v["geo"])
        tp += tpi
        pred_pos += ppi
        gt_pos += gpi
    return {
        "f1": float(np.mean(f1s)) if f1s else 0.0,
        "precision": float(tp / pred_pos) if pred_pos else 0.0,
        "recall": float(tp / gt_pos) if gt_pos else 0.0,
        "geo": float(np.mean(geos)) if geos else 0.0,
        "num_images": len(imgwise),
    }


def damon_semantic_contact(saved: Dict) -> Dict:
    """Object-wise + category-wise semantic contact metrics
    (reference evaluate.py:355-424)."""
    objnames = [o[0][0].lower() for o in saved["objnames"]]
    by_obj: Dict[str, List[int]] = {}
    for i, obj in enumerate(objnames):
        by_obj.setdefault(obj, []).append(i)

    def group_stats(indices):
        preds = [saved["pred"][i] for i in indices]
        gts = [saved["gt"][i] for i in indices]
        tp = sum(np.sum(np.logical_and(p, g)) for p, g in zip(preds, gts))
        pp = sum(np.sum(p) for p in preds)
        gp = sum(np.sum(g) for g in gts)
        return {
            "num_samples": len(indices),
            "avg_f1": float(np.mean([saved["f1"][i] for i in indices])),
            "precision": float(tp / pp) if pp else 0.0,
            "recall": float(tp / gp) if gp else 0.0,
            "geo": float(np.mean([saved["geo"][i] for i in indices])),
        }

    semantic = {obj: group_stats(idx) for obj, idx in by_obj.items()}
    total = sum(r["num_samples"] for r in semantic.values())
    weighted_f1 = (
        sum(r["avg_f1"] * r["num_samples"] for r in semantic.values()) / total
        if total else 0.0
    )

    categories = {}
    for cat, objs in DAMON_CATEGORIES_MAPPING.items():
        idx = [i for i, o in enumerate(objnames) if o in objs]
        if idx:
            categories[cat] = group_stats(idx)

    return {
        "objectwise": semantic,
        "weighted_f1": weighted_f1,
        "categories": categories,
    }


def main(argv=None):
    """Eval CLI (reference ``evaluate.py main_eval``, :486-601): re-hydrate
    the training config from the run dir (eval_utils.py:215-244), restore
    the exported/best params, run generate-mode validation on the requested
    dataset, and emit the DAMON reports."""
    import argparse
    import json

    from interactvlm_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()
    import os

    import jax

    p = argparse.ArgumentParser("interactvlm_tpu evaluation")
    p.add_argument("--run_dir", required=True,
                   help="training run dir (config + checkpoints)")
    p.add_argument("--dataset_dir", default="./data")
    p.add_argument("--val_dataset", default="hcontact")
    p.add_argument("--inference_type", default="generate",
                   choices=["generate", "forward"])
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--kv_cache", default="dense", choices=["dense", "int8"],
                   help="KV-cache precision for the decode loop")
    p.add_argument("--quantize_weights", action="store_true",
                   help="int8-quantize large LLaMA kernels for serving "
                        "(the reference's bitsandbytes role, "
                        "run_demo.py:106-129)")
    p.add_argument("--geodesic_npy", default=None,
                   help="path to smpl_neutral_geodesic_dist.npy (6890^2 "
                        "geodesic matrix; reference eval_utils.py:15) -- "
                        "enables the geodesic FP/FN columns")
    p.add_argument("--distributed", action="store_true",
                   help="shard eval batches over all devices' data axis "
                        "(reference DistributedSampler, evaluate.py:346)")
    p.add_argument("--cache_view_encode", default="auto",
                   choices=["auto", "on", "off"],
                   help="encode the fixed canonical view renders once and "
                        "reuse the frozen-encoder embedding every batch "
                        "(auto: on for hcontact, off for per-sample-render "
                        "object tasks)")
    p.add_argument("--max_new_tokens", type=int, default=512,
                   help="generation budget per answer (reference "
                        "evaluate.py:104 uses 512; bench.py pins 32 as "
                        "its perf protocol)")
    p.add_argument("--max_seg_tokens", type=int, default=0,
                   help="seg-token mask sets decoded per answer; 0 = "
                        "auto from the re-hydrated token_type (2 for "
                        "Gen-Hu-Obj/Gen-Int)")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    from interactvlm_tpu.train.checkpoints import CheckpointManager, load_config
    from interactvlm_tpu.train.train import build_model_and_config, parse_args

    cfg_json = load_config(args.run_dir, "pretrained_config.json")
    train_args = parse_args([])
    for k, v in cfg_json.items():
        if hasattr(train_args, k):
            setattr(train_args, k, v)
    # token registry persisted at train time (tokens precede the model build)
    token_kw = {
        k: cfg_json[k]
        for k in ("vocab_size", "seg_token_idx",
                  "hseg_token_idx", "oseg_token_idx")
        if k in cfg_json
    }
    model, cfg = build_model_and_config(train_args, **token_kw)

    import flax.linen as nn

    from interactvlm_tpu.utils.testing import make_synthetic_batch

    example = make_synthetic_batch(cfg, B=args.batch_size,
                                   mask_size=train_args.mask_size)
    abstract = jax.eval_shape(
        lambda: nn.meta.unbox(model.init(jax.random.PRNGKey(0), example))
    )
    from interactvlm_tpu.train.optimizer import make_optimizer, trainable_mask
    from interactvlm_tpu.train.train_step import TrainState

    tx, _ = make_optimizer(mask=trainable_mask)
    abstract_state = TrainState(
        step=jax.ShapeDtypeStruct((), "int32"),
        params=abstract,
        opt_state=jax.eval_shape(tx.init, abstract),
    )
    ckpt = CheckpointManager(args.run_dir)
    state = ckpt.restore_best(abstract_state) or ckpt.restore(abstract_state)
    assert state is not None, f"no checkpoint in {args.run_dir}"
    params = state.params
    if args.quantize_weights:
        # quantize-then-dequantize keeps one model code path while halving
        # checkpoint-to-HBM transfer and matching bnb int8 numerics; the
        # int8_matmul fast path is exercised by ops/quant tests.
        from interactvlm_tpu.ops.quant import (
            dequantize_params,
            quantize_params_int8,
        )

        def _llama_kernels(path: str) -> bool:
            return "llava/lm" in path

        params = dequantize_params(
            quantize_params_int8(params, filter_fn=_llama_kernels),
            dtype=cfg.llama.dtype,
        )
    if cfg.llama.dtype != jnp.float32:
        # store weights in the serving dtype once; f32 storage makes flax
        # re-cast every param at every use (see utils/weights.py)
        from interactvlm_tpu.utils.weights import cast_serving_params

        params = jax.jit(
            lambda p: cast_serving_params(p, cfg.llama.dtype)
        )(params)

    if args.synthetic:
        def batches():
            for i in range(args.max_batches or 2):
                b = make_synthetic_batch(
                    cfg, B=args.batch_size, tasks=(2,),
                    mask_size=train_args.mask_size, seed=i,
                )
                meta = {
                    "image_paths": [f"img{i}_{j}.jpg"
                                    for j in range(args.batch_size)],
                    "sampled_classes_list": [["chair"]] * args.batch_size,
                }
                yield b, meta
        human_maps = {
            "p2v": example["human_p2v"], "bary": example["human_bary"],
            "num_vertices": cfg.num_human_vertices,
        }
        mask_size = train_args.mask_size
    else:
        from interactvlm_tpu.data.collate import collate
        from interactvlm_tpu.data.datasets import ValDataset

        from interactvlm_tpu.utils.constants import add_new_tokens

        if cfg_json.get("tokenizer") == "whitespace":
            # offline deterministic tokenizer (train --tokenizer whitespace)
            from interactvlm_tpu.utils.testing import WhitespaceTokenizer

            tokenizer = WhitespaceTokenizer(train_args.model_max_length)
        else:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(cfg_json["version"])
            tokenizer.pad_token = tokenizer.unk_token
        tokenizer, *_ = add_new_tokens(tokenizer, train_args.token_type)
        from interactvlm_tpu.data.datasets import build_dataset

        # one construction path with train/validate: prompts, view types
        # and vertex counts come from the re-hydrated training config
        ds = ValDataset(
            build_dataset(args.val_dataset, args.dataset_dir, "test",
                          train_args)
        )
        mask_size = (
            train_args.image_size
            if train_args.image_size != 1024
            else ds.dataset.view_set.mask_size
        )
        from interactvlm_tpu.train.train import _load_human_maps

        human_maps = _load_human_maps(args.dataset_dir)
        if human_maps is not None:
            human_maps = {
                **human_maps, "num_vertices": cfg.num_human_vertices,
            }

        def batches():
            from interactvlm_tpu.runtime.prefetch import iter_sample_batches

            for samples in iter_sample_batches(ds, args.batch_size):
                yield collate(samples, tokenizer,
                              max_len=train_args.model_max_length,
                              num_human_vertices=cfg.num_human_vertices,
                              num_object_points=cfg.num_object_points,
                              human_maps=human_maps,
                              include_object_maps=args.val_dataset in
                              ("oafford", "ocontact"))

    dist_matrix = None
    if args.geodesic_npy:
        dist_matrix = np.load(args.geodesic_npy)
        assert dist_matrix.shape[0] == dist_matrix.shape[1], (
            dist_matrix.shape
        )
    mesh = None
    if args.distributed:
        from interactvlm_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(n_data=len(jax.devices()), n_model=1)

    results, saved = validate(
        batches(), model, params, cfg, args.val_dataset, mask_size,
        inference_type=args.inference_type,
        human_maps=human_maps, max_batches=args.max_batches,
        kv_cache=args.kv_cache, dist_matrix=dist_matrix, mesh=mesh,
        cache_view_encode=(None if args.cache_view_encode == "auto"
                           else args.cache_view_encode == "on"),
        max_new_tokens=args.max_new_tokens,
        max_seg_tokens=args.max_seg_tokens or None,
    )
    report = {"metrics": results}
    if "hcontact" in args.val_dataset and saved["pred"]:
        report["damon_binary"] = damon_binary_contact(saved)
        report["damon_semantic"] = {
            "weighted_f1": damon_semantic_contact(saved)["weighted_f1"]
        }
    print(json.dumps(report, indent=2, default=float))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2, default=float)
    return report


if __name__ == "__main__":
    main()
