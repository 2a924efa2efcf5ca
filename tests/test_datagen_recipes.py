"""Closed-loop datagen tests: each per-dataset recipe writes a tree that
the corresponding dataset class loads (reference preprocess_data scripts ->
datasets/ consumption, VERDICT r1 item 7 'per-dataset datagen recipes')."""

import os
from os.path import join

import numpy as np
import pytest
from PIL import Image

from interactvlm_tpu.datagen.recipes import (
    AFFORD_LIST_PIAD,
    extract_point_file_lemon,
    extract_point_file_piad,
    generate_damon_tree,
    generate_lemon_human_tree,
    generate_piad_tree,
    generate_pico_tree,
    generate_rich_tree,
    get_body_parts_from_vertices,
    get_contact_subset,
)
from interactvlm_tpu.geometry.views import HUMAN_VIEWS, OBJECT_VIEWS

S = 64


def sphere_mesh(n_lat=12, n_lon=16, radius=0.8):
    verts = [(0.0, radius, 0.0)]
    for i in range(1, n_lat):
        t = np.pi * i / n_lat
        for j in range(n_lon):
            p = 2 * np.pi * j / n_lon
            verts.append((radius * np.sin(t) * np.cos(p),
                          radius * np.cos(t),
                          radius * np.sin(t) * np.sin(p)))
    verts.append((0.0, -radius, 0.0))
    faces = []
    for j in range(n_lon):
        faces.append((0, 1 + j, 1 + (j + 1) % n_lon))
    for i in range(n_lat - 2):
        r0, r1 = 1 + i * n_lon, 1 + (i + 1) * n_lon
        for j in range(n_lon):
            a, b = r0 + j, r0 + (j + 1) % n_lon
            c, d = r1 + j, r1 + (j + 1) % n_lon
            faces += [(a, c, b), (b, c, d)]
    last = len(verts) - 1
    ring = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        faces.append((last, ring + (j + 1) % n_lon, ring + j))
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))


@pytest.fixture(scope="module")
def body():
    return sphere_mesh()


@pytest.fixture(scope="module")
def segm(body):
    verts, _ = body
    n = len(verts)
    # fake merged SMPL segmentation: top/bottom halves + feet = bottom cap
    return {
        "head": list(range(0, n // 4)),
        "torso": list(range(n // 4, n // 2)),
        "left foot": list(range(n - 20, n - 10)),
        "right foot": list(range(n - 10, n)),
    }


def put_image(root, name):
    os.makedirs(os.path.dirname(join(root, "images", name)), exist_ok=True)
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    ).save(join(root, "images", name))


class TestBodyParts:
    def test_coverage_threshold(self, segm):
        parts = get_body_parts_from_vertices(list(range(0, 40)), segm)
        assert "head" in parts  # full coverage of the head range
        assert "left foot" not in parts

    def test_contact_subset(self, segm):
        ids = np.arange(0, 7000)
        sub = get_contact_subset(ids, segm, ("left foot", "right foot"))
        assert set(sub) == set(segm["left foot"]) | set(segm["right foot"])


class TestPointFileParsers:
    def test_piad(self, tmp_path):
        p = tmp_path / "chair_1.txt"
        lines = [
            f"{i} Chair {i * 0.1} {i * 0.2} {i * 0.3} "
            + " ".join(str((i + j) % 2) for j in range(17))
            for i in range(5)
        ]
        p.write_text("\n".join(lines))
        pts, aff, name = extract_point_file_piad(str(p))
        assert pts.shape == (5, 3) and aff.shape == (5, 17)
        assert name == "Chair"
        assert int(np.argwhere(AFFORD_LIST_PIAD == "sit").item()) == 5

    def test_lemon(self, tmp_path):
        p = tmp_path / "mug_7.txt"
        lines = [
            f"{i * 0.1} {i * 0.2} {i * 0.3} "
            + " ".join(str((i + j) % 2) for j in range(13))
            for i in range(4)
        ]
        p.write_text("\n".join(lines))
        pts, aff, name = extract_point_file_lemon(str(p))
        assert pts.shape == (4, 3) and aff.shape == (4, 13)
        assert name == "mug"


class TestDamonRecipe:
    def test_tree_loads_with_dataset(self, tmp_path, body, segm):
        from interactvlm_tpu.data.datasets import HContactDataset

        verts, faces = body
        root = str(tmp_path)
        put_image(root, "img1.jpg")
        annot = {
            "img1.jpg": {
                "chair": np.arange(0, 30),
                # 'supporting' with foot vertices -> foot_ground subset
                "supporting": np.concatenate(
                    [np.arange(0, 10), np.arange(len(verts) - 20, len(verts))]
                ),
            }
        }
        out = generate_damon_tree(
            root, annot, verts, faces,
            HUMAN_VIEWS["4MV-Z_Vitru_mv2"], S, segm,
        )
        assert "foot_ground" in out["annot"]["img1.jpg"]
        assert "head" in out["body_parts"]["img1.jpg"]["chair"]

        ds = HContactDataset(root, image_size=S, parts_dropout=0.0)
        names = {s[3] for s in ds.samples}
        assert "scene" in names  # foot_ground renamed on load
        s = ds[0]
        assert s.sam_images.shape == (4, S, S, 3)
        assert s.masks.shape == (4, S, S)
        assert s.gt_contact_3d.sum() > 0
        # the generated grey renders carry a valid (non-white) body region
        assert (s.masks != -1).any()

    def test_path_qualified_image_names(self, tmp_path, body, segm):
        """Masks must be keyed by the image BASENAME (reference
        hcontact_3d.py:61) so path-qualified names (RICH-style
        'seq/cam/frame.jpg') close the datagen -> loader loop."""
        from interactvlm_tpu.data.datasets import HContactDataset

        verts, faces = body
        root = str(tmp_path)
        put_image(root, "seq01/cam2/f001.jpg")
        generate_damon_tree(
            root, {"seq01/cam2/f001.jpg": {"chair": np.arange(0, 30)}},
            verts, faces, HUMAN_VIEWS["4MV-Z_Vitru_mv2"], S, segm,
        )
        ds = HContactDataset(root, image_size=S, parts_dropout=0.0)
        s = ds[0]  # raises FileNotFoundError if stems disagree
        assert s.gt_contact_3d.sum() > 0

    def test_rich_recipe_scene_class(self, tmp_path, body, segm):
        from interactvlm_tpu.data.datasets import HContactDataset

        verts, faces = body
        root = str(tmp_path)
        put_image(root, "r1.jpg")
        generate_rich_tree(
            root, {"r1.jpg": np.arange(5, 60)}, verts, faces,
            HUMAN_VIEWS["4MV-Z_Vitru_mv2"], S, segm,
        )
        ds = HContactDataset(root, image_size=S)
        assert {s[3] for s in ds.samples} == {"scene"}


class TestLemonRecipe:
    def test_tree_loads_with_dataset(self, tmp_path, body, segm):
        from interactvlm_tpu.data.datasets import HContactDataset

        verts, faces = body
        root = str(tmp_path)
        os.makedirs(join(root, "lemon", "Images"), exist_ok=True)
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            join(root, "lemon", "Images", "mug_0007.jpg")
        )
        contact = np.zeros(len(verts), np.float32)
        contact[:25] = 1.0
        zero = np.zeros(len(verts), np.float32)
        generate_lemon_human_tree(
            root,
            {"lemon/Images/mug_0007.jpg": contact,
             "lemon/Images/cup_0001.jpg": zero},  # skipped
            verts, faces, HUMAN_VIEWS["4MV-Z_Vitru_mv2"], S, segm,
        )
        ds = HContactDataset(root, image_size=S, sources="lemon",
                             parts_dropout=0.0)
        assert len(ds) == 1
        s = ds[0]
        assert s.sampled_classes == ["mug"]
        assert s.gt_contact_3d.sum() == 25


class TestObjectRecipes:
    def test_piad_tree_loads_with_dataset(self, tmp_path):
        from interactvlm_tpu.data.datasets import OAffordDataset

        root = str(tmp_path)
        put_image(root, "chair_img.jpg")
        rng = np.random.default_rng(3)
        txt = tmp_path / "chair_3.txt"
        lines = []
        for i in range(300):
            xyz = rng.normal(size=3) * 0.4
            aff = (rng.random(17) > 0.5).astype(int)
            aff[5] = 1  # 'sit' column always on
            lines.append(
                f"{i} Chair " + " ".join(f"{v:.4f}" for v in xyz) + " "
                + " ".join(str(a) for a in aff)
            )
        txt.write_text("\n".join(lines))
        generate_piad_tree(
            root, {"chair_003": str(txt)}, OBJECT_VIEWS["4MV-Z_HM"], S,
            image_for={"chair_003": "chair_img.jpg"},
            object_matches={"chair_003": ["chair_003"]},
            affordance="sit",
        )
        ds = OAffordDataset(root, image_size=S)
        assert len(ds) == 1
        s = ds[0]
        assert s.obj_p2p is not None and (s.obj_p2p >= 0).any()
        assert s.gt_contact_3d[:300].sum() == 300  # 'sit' on everywhere
        vals = s.masks[s.masks != -1]
        assert vals.size and vals.max() <= 1

    def test_pico_tree_loads_with_dataset(self, tmp_path, body):
        from interactvlm_tpu.data.datasets import OContactDataset

        verts, faces = body
        root = str(tmp_path)
        put_image(root, "mug_img.jpg")
        contact = np.zeros(len(verts), np.float32)
        contact[10:50] = 1.0
        generate_pico_tree(
            root,
            {"mug_009": {"verts": verts, "faces": faces,
                         "contact": contact, "image": "mug_img.jpg",
                         "class_name": "Mug"}},
            OBJECT_VIEWS["4MV-Z_HM_BM"], S,
        )
        ds = OContactDataset(root, image_size=S)
        assert len(ds) == 1
        s = ds[0]
        assert s.obj_p2v is not None and s.obj_bary is not None
        assert s.num_valid_verts == len(verts)
        assert s.gt_contact_3d[:len(verts)].sum() == 40
        assert (s.masks == 1).any()
