"""Datagen CLI (reference ``scripts/run_datagen.sh`` ->
``preprocess_data/generate_*`` drivers).

Usage:
  python -m interactvlm_tpu.datagen damon --root ./data \
      --contact_pkl damon_contact.pkl --mesh body.npz --segm merged_segm.pkl
  python -m interactvlm_tpu.datagen lemon-hu --root ./data \
      --contact_pkl lemon_contacts.pkl --mesh body.npz --segm merged_segm.pkl
  python -m interactvlm_tpu.datagen rich  ... (same args as damon)
  python -m interactvlm_tpu.datagen piad --root ./data \
      --points_dir piad_txt/ [--dataset piad|lemon] [--affordance sit]
  python -m interactvlm_tpu.datagen pico --root ./data --meshes_pkl pico.pkl

Input formats:
  --mesh        npz with ``verts`` (N, 3) f32 and ``faces`` (F, 3) i32
                (a posed Vitruvian body; see datagen.generate.vitruvian_pose)
  --contact_pkl damon/rich: {image: {obj: vertex ids}} / {image: ids}
                lemon-hu: {image_relpath: per-vertex contact (N,)}
  --segm        merged SMPL segmentation {part: vertex ids}
  --meshes_pkl  pico: {object_id: {verts, faces, contact, image, class_name}}
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def _load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def main(argv=None):
    p = argparse.ArgumentParser("interactvlm_tpu datagen")
    p.add_argument("recipe",
                   choices=["damon", "lemon-hu", "rich", "piad", "pico"])
    p.add_argument("--root", required=True)
    p.add_argument("--contact_pkl")
    p.add_argument("--mesh")
    p.add_argument("--segm")
    p.add_argument("--points_dir")
    p.add_argument("--meshes_pkl")
    p.add_argument("--dataset", default="piad", choices=["piad", "lemon"])
    p.add_argument("--affordance", default="sit")
    p.add_argument("--split", default="train")
    p.add_argument("--view_type", default=None)
    p.add_argument("--image_size", type=int, default=1024)
    p.add_argument("--min_vertices", type=int, default=2)
    args = p.parse_args(argv)

    from interactvlm_tpu.datagen import recipes as R
    from interactvlm_tpu.geometry.views import HUMAN_VIEWS, OBJECT_VIEWS

    if args.recipe in ("damon", "lemon-hu", "rich"):
        view = HUMAN_VIEWS[args.view_type or "4MV-Z_Vitru_mv2"]
        mesh = np.load(args.mesh)
        verts, faces = mesh["verts"], mesh["faces"]
        segm = _load_pickle(args.segm)
        contacts = _load_pickle(args.contact_pkl)
        if args.recipe == "damon":
            out = R.generate_damon_tree(
                args.root, contacts, verts, faces, view, args.image_size,
                segm, args.min_vertices,
            )
            print(f"damon: {len(out['annot'])} images")
        elif args.recipe == "rich":
            out = R.generate_rich_tree(
                args.root, contacts, verts, faces, view, args.image_size,
                segm, args.min_vertices,
            )
            print(f"rich: {len(out['annot'])} images")
        else:
            out = R.generate_lemon_human_tree(
                args.root, contacts, verts, faces, view, args.image_size,
                segm, split=args.split, min_vertices=args.min_vertices,
            )
            print(f"lemon-hu: {len(out['images'])} images")
    elif args.recipe == "piad":
        view = OBJECT_VIEWS[args.view_type or "4MV-Z_HM"]
        files = {
            os.path.splitext(f)[0]: os.path.join(args.points_dir, f)
            for f in sorted(os.listdir(args.points_dir))
            if f.endswith(".txt")
        }
        recs = R.generate_piad_tree(
            args.root, files, view, args.image_size, split=args.split,
            dataset=args.dataset, affordance=args.affordance,
        )
        print(f"{args.dataset}: {len(recs)} objects")
    else:  # pico
        view = OBJECT_VIEWS[args.view_type or "4MV-Z_HM_BM"]
        meshes = _load_pickle(args.meshes_pkl)
        recs = R.generate_pico_tree(
            args.root, meshes, view, args.image_size, split=args.split,
            min_vertices=args.min_vertices,
        )
        print(f"pico: {len(recs)} objects")


if __name__ == "__main__":
    main()
