"""End-user inference CLI.

Rebuild of the reference ``run_demo.py``: per-image 3D contact prediction
for the hcontact / h2dcontact / oafford / ocontact modes with the
reference's fixed prompts (run_demo.py:217,254,282), canonical-view SAM
preprocessing, and the output bundle (contact npz incl. SMPL-X conversion,
contact-colored OBJ, 2x2 overlay grid).

Supports ``--random_weights`` (+ the test tokenizer) for smoke runs without
released checkpoints.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from os.path import basename, join, splitext

import numpy as np

HCONTACT_PROMPT = (
    "Segment the area on the human's body that is in direct contact with "
    "the {object} in this image."
)
H2D_PROMPT = HCONTACT_PROMPT
OAFFORD_PROMPT = (
    "Segment the area on the {class_name} where the human is making direct "
    "contact in this image."
)


def parse_args(argv=None):
    p = argparse.ArgumentParser("interactvlm_tpu demo")
    p.add_argument("--img_folder", required=True)
    p.add_argument("--output_folder", required=True)
    p.add_argument("--contact_type", default="hcontact",
                   choices=["hcontact", "h2dcontact", "oafford", "ocontact"])
    p.add_argument("--model_dir", default=None,
                   help="converted/merged HF checkpoint dir")
    p.add_argument("--sam_renders_dir", default=None,
                   help="canonical human renders (hcontact mode)")
    p.add_argument("--human_maps", default=None,
                   help="npz with p2v/bary lift maps (hcontact mode)")
    p.add_argument("--smpl_to_smplx", default=None,
                   help="mapping pkl for SMPL-X output")
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--random_weights", action="store_true")
    p.add_argument("--mask_size", type=int, default=None)
    p.add_argument("--body_template", default=None,
                   help="OBJ of the body template mesh (SMPL/SMPL-X); "
                        "hcontact mode exports it with contact vertices "
                        "colored (reference process_smplx_mesh_with_"
                        "contacts, run_demo.py:455-462)")
    return p.parse_args(argv)


def object_name_from(path: str) -> str:
    # reference: '<object>__<id>.jpg' file naming (run_demo.py:215)
    return basename(path).split("__")[0].lower()


def build_prompt(args, image_path: str) -> str:
    from interactvlm_tpu.data.conversations import get_conversation_template
    from interactvlm_tpu.utils.constants import DEFAULT_IMAGE_TOKEN

    name = object_name_from(image_path)
    if args.contact_type in ("hcontact", "h2dcontact"):
        q = HCONTACT_PROMPT.format(object=name)
    else:
        q = OAFFORD_PROMPT.format(class_name=name)
    conv = get_conversation_template("llava_v1")
    conv.append_message(conv.roles[0], DEFAULT_IMAGE_TOKEN + "\n" + q)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def main(argv=None):
    args = parse_args(argv)

    from interactvlm_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()

    import jax
    import jax.numpy as jnp

    from interactvlm_tpu import config as cfgs
    from interactvlm_tpu.data.tokenization import (
        tokenizer_image_token,
        wrap_image_tokens,
    )
    from interactvlm_tpu.data.transforms import (
        clip_preprocess,
        load_image_rgb,
        sam_preprocess,
    )
    from interactvlm_tpu.demo import demo_utils
    from interactvlm_tpu.eval.evaluate import evaluate_batch
    from interactvlm_tpu.fit.data_io import load_obj_mesh
    from interactvlm_tpu.geometry.views import (
        HUMAN_VIEWS,
        normalize_cam_params,
    )
    from interactvlm_tpu.models.interactvlm import InteractVLM
    from interactvlm_tpu.utils.testing import (
        WhitespaceTokenizer,
        make_synthetic_batch,
    )

    os.makedirs(args.output_folder, exist_ok=True)

    if args.random_weights:
        cfg = cfgs.interactvlm_tiny()
        tokenizer = WhitespaceTokenizer()
        tokenizer.vocab["[SEG]"] = cfg.seg_token_idx
        mask_size = args.mask_size or 64
    else:
        from transformers import AutoTokenizer

        from interactvlm_tpu.utils.constants import add_new_tokens

        cfg = cfgs.interactvlm_13b()
        tokenizer = AutoTokenizer.from_pretrained(args.model_dir)
        tokenizer, seg, hseg, oseg = add_new_tokens(tokenizer, cfg.token_type)
        cfg = dataclasses.replace(
            cfg, seg_token_idx=seg, hseg_token_idx=hseg, oseg_token_idx=oseg
        )
        mask_size = args.mask_size or 1024

    model = InteractVLM(cfg)
    example = make_synthetic_batch(cfg, B=1, mask_size=mask_size)
    if args.random_weights:
        params = jax.jit(model.init)(jax.random.PRNGKey(0), example)
    else:
        from interactvlm_tpu.utils.weights import (
            convert_interactvlm_checkpoint,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(
            join(args.model_dir, "pytorch_model.bin")
        )
        params = {"params": convert_interactvlm_checkpoint(sd, cfg)}
    if cfg.llama.dtype != jnp.float32:
        # one-time cast to the serving dtype (f32 storage re-casts per use)
        from interactvlm_tpu.utils.weights import cast_serving_params

        params = jax.jit(
            lambda p: cast_serving_params(p, cfg.llama.dtype)
        )(params)

    V = cfg.multiview_channels
    S = cfg.sam.img_size

    # canonical human views + lift maps
    human_maps = None
    sam_views = None
    cam_params = np.zeros((1, V, 5), np.float32)
    if args.contact_type == "hcontact":
        vs = HUMAN_VIEWS[cfg.hC_sam_view_type]
        cam_params = normalize_cam_params(vs.cam_params())[None]
        if args.sam_renders_dir:
            views, raws = [], []
            for name in vs.names:
                img = load_image_rgb(join(args.sam_renders_dir, f"{name}.png"))
                raws.append(img)
                t, _ = sam_preprocess(img, S)
                views.append(t)
            sam_views = np.stack(views)[None]
            fixed_renders = np.stack(raws)
        else:
            fixed_renders = None
        if args.human_maps:
            m = np.load(args.human_maps)
            from interactvlm_tpu.geometry.lift import corner_major

            human_maps = {
                "p2v": jnp.asarray(corner_major(np.asarray(m["p2v"]))),
                "bary": jnp.asarray(corner_major(np.asarray(m["bary"]))),
                "num_vertices": int(m["p2v"].max()) + 1,
            }
    else:
        fixed_renders = None

    images = sorted(
        f for f in os.listdir(args.img_folder)
        if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    results = []
    for fname in images:
        path = join(args.img_folder, fname)
        stem = splitext(fname)[0]
        prompt = wrap_image_tokens(build_prompt(args, path))
        ids = np.asarray(
            [tokenizer_image_token(prompt, tokenizer)], np.int32
        )
        clip_img = clip_preprocess(
            load_image_rgb(path), cfg.clip.image_size
        )[None]

        meta = None
        obj_mesh = None
        raw_renders = fixed_renders
        if args.contact_type in ("oafford", "ocontact"):
            obj_dir = join(os.path.dirname(path), "sam_inp_objs")
            mesh_path = join(os.path.dirname(path), "object_mesh.obj")
            obj_mesh = load_obj_mesh(mesh_path)
            if not os.path.exists(join(obj_dir, "lift2d_dict.pkl")):
                demo_utils.generate_sam_inp_objs(*obj_mesh, obj_dir,
                                                 image_size=mask_size)
            object_maps = demo_utils.load_lift2d_dict(
                join(obj_dir, "lift2d_dict.pkl")
            )
            views, raws = [], []
            from interactvlm_tpu.geometry.views import OBJECT_VIEWS
            ovs = OBJECT_VIEWS["4MV-Z_HM_MeshInf"]
            for name in ovs.names:
                img = load_image_rgb(join(obj_dir, f"{name}.png"))
                raws.append(img)
                t, _ = sam_preprocess(img, S)
                views.append(t)
            sam_imgs = np.stack(views)[None]
            raw_renders = np.stack(raws)
            cams = normalize_cam_params(ovs.cam_params())[None]
            maps_kw = {"object_maps": object_maps}
        elif args.contact_type == "h2dcontact":
            # SAM runs on the PHOTO itself; masks score in the original
            # frame (reference h2dcontact serving; evaluate_batch's meta
            # path drives sam.postprocess_masks crop-then-resize)
            raw = load_image_rgb(path)
            t, resize = sam_preprocess(raw, S)
            sam_imgs = np.repeat(t[None], V, axis=0)[None]
            raw_renders = None
            cams = np.zeros((1, V, 5), np.float32)
            meta = {"resize_list": [resize],
                    "label_list": [np.zeros(raw.shape[:2], np.float32)]}
            maps_kw = {}
        else:
            sam_imgs = (
                sam_views if sam_views is not None
                else np.zeros((1, V, S, S, 3), np.float32)
            )
            cams = cam_params
            maps_kw = {"human_maps": human_maps}

        from interactvlm_tpu.utils.constants import IGNORE_INDEX

        batch = {
            "input_ids": ids,
            # all-IGNORE labels: no answer-start truncation at demo time
            "labels": np.full_like(ids, IGNORE_INDEX),
            "images_clip": jnp.asarray(clip_img),
            "sam_images": jnp.asarray(sam_imgs),
            "cam_params": jnp.asarray(cams),
        }
        out = evaluate_batch(
            model, params, batch, cfg, mask_size,
            contact_type=args.contact_type,
            max_new_tokens=args.max_new_tokens, meta=meta, **maps_kw,
        )

        np.save(join(args.output_folder, f"{stem}_pred_masks.npy"),
                out["pred_masks"][0])

        # ---- reference output bundle (reference run_demo.py:436-558) ----
        from PIL import Image as _Image

        pm = np.asarray(out["pred_masks"][0], np.float32)  # (V, h, w)
        probs = 1.0 / (1.0 + np.exp(-pm))
        if raw_renders is not None and probs.shape[0] >= 4:
            # 2x2 mask-overlay grid over the view renders
            Hr, Wr = raw_renders.shape[1:3]
            masks_r = np.stack([
                np.asarray(_Image.fromarray(
                    (p * 255).astype(np.uint8)).resize(
                        (Wr, Hr), _Image.BILINEAR), np.float32) / 255.0
                for p in probs[:4]
            ])
            grid = demo_utils.overlay_grid(raw_renders[:4], masks_r)
            _Image.fromarray(grid).save(join(
                args.output_folder,
                f"{stem}_{args.contact_type}_concat.jpg"))
        if out.get("pred_masks_original") is not None:
            # h2dcontact / 2D: mask in the ORIGINAL photo frame + overlay
            om = np.asarray(out["pred_masks_original"][0], np.float32)
            np.save(join(args.output_folder,
                         f"{stem}_pred_mask_original.npy"), om)
            photo = load_image_rgb(path)
            over = demo_utils.overlay_grid(
                photo[None], (1.0 / (1.0 + np.exp(-om)))[None])
            _Image.fromarray(over[: photo.shape[0], : photo.shape[1]]).save(
                join(args.output_folder, f"{stem}_h2dcontact_overlay.jpg"))
        if out["pred_contact_3d"] is not None:
            contact = out["pred_contact_3d"][0]
            save = {"contact": contact}
            if args.smpl_to_smplx and args.contact_type == "hcontact":
                mapping = demo_utils.load_smpl_to_smplx_mapping(
                    args.smpl_to_smplx
                )
                save["contact_smplx"] = (
                    demo_utils.convert_contacts_smpl_to_smplx(
                        contact, mapping
                    )
                )
            np.savez(
                join(args.output_folder, f"{stem}_{args.contact_type}"
                     "_vertices.npz"),
                **save,
            )
            # contact-colored OBJ (reference run_demo.py:455-478)
            if args.contact_type in ("oafford", "ocontact") and obj_mesh:
                demo_utils.export_contact_obj(
                    join(args.output_folder,
                         f"{stem}_object_mesh_with_contacts_"
                         f"{args.contact_type}.obj"),
                    obj_mesh[0], obj_mesh[1],
                    contact[: len(obj_mesh[0])], threshold=0.5,
                )
            elif args.contact_type == "hcontact" and args.body_template:
                bv, bf = load_obj_mesh(args.body_template)
                body_contact = save.get("contact_smplx", contact)
                if len(bv) == np.asarray(body_contact).size:
                    demo_utils.export_contact_obj(
                        join(args.output_folder,
                             f"{stem}_body_with_hcontacts.obj"),
                        bv, bf, body_contact, threshold=0.3,
                    )
                else:
                    print(f"body_template has {len(bv)} verts, contact "
                          f"{np.asarray(body_contact).size}; skipping OBJ")
        results.append({"image": fname, "has_seg": bool(out["has_seg"][0])})
        print(f"{fname}: seg={bool(out['has_seg'][0])}")

    print(f"demo done: {len(results)} images -> {args.output_folder}")
    return results


if __name__ == "__main__":
    main()
