"""Datagen + demo-utils tests: point rasterization round trip, object asset
generation, human asset generation with verification, sam_inp_objs, demo
CLI smoke with random weights."""

import os
import pickle
from os.path import join

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from interactvlm_tpu.datagen.generate import (
    generate_human_assets,
    generate_object_assets,
    vitruvian_pose,
)
from interactvlm_tpu.demo import demo_utils
from interactvlm_tpu.geometry.point_raster import (
    lift_points_roundtrip,
    normalize_point_cloud,
    rasterize_points,
)
from interactvlm_tpu.geometry.views import HUMAN_VIEWS, OBJECT_VIEWS
from tests.test_geometry import uv_sphere


def sphere_points(n=512, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


class TestPointRaster:
    def test_rasterize_and_roundtrip(self):
        pts = jnp.asarray(sphere_points())
        cams = OBJECT_VIEWS["4MV-Z_HM"].cam_params()
        p2ps = []
        for cam in cams:
            p2p, zbuf = rasterize_points(pts, jnp.asarray(cam), 96, radius=2)
            p2ps.append(p2p)
            assert int((np.asarray(p2p) >= 0).sum()) > 200
        # affordance round trip: values rendered per view then lifted back
        vals = jnp.asarray(
            (sphere_points()[:, 0] > 0).astype(np.float32)
        )
        lifted = np.asarray(lift_points_roundtrip(vals, p2ps, 512))
        visible = np.unique(
            np.concatenate([np.asarray(p)[np.asarray(p) >= 0] for p in p2ps])
        )
        orig = np.asarray(vals)
        agree = (lifted[visible] > 0.5) == (orig[visible] > 0.5)
        assert agree.mean() > 0.95

    def test_normalize_point_cloud(self):
        pts = np.random.default_rng(0).normal(size=(100, 3)) * 5 + 7
        out = np.asarray(normalize_point_cloud(jnp.asarray(pts)))
        assert np.abs(out.mean(0)).max() < 0.5
        assert np.linalg.norm(out, axis=1).max() == pytest.approx(1.0, abs=1e-5)


class TestDatagen:
    def test_vitruvian_pose(self):
        pose = vitruvian_pose()
        assert pose.shape == (21, 3, 3)
        # legs rotated about z by +-30 deg
        assert pose[0, 0, 0] == pytest.approx(np.cos(np.deg2rad(30)), abs=1e-5)
        assert np.allclose(pose[2], np.eye(3), atol=1e-6)

    def test_generate_human_assets_with_verification(self, tmp_path):
        verts, faces = uv_sphere(n_lat=16, n_lon=20)
        contact = {"img1": {"chair": np.where(verts[:, 0] > 0.4)[0]}}
        out = generate_human_assets(
            verts, faces, HUMAN_VIEWS["4MV-Z_Vitru_mv2"], 96,
            contact_sets=contact, out_dir=str(tmp_path),
        )
        assert out["p2v"].shape[0] == 4
        v = out["verify"][("img1", "chair")]
        assert v["original_visible"] > 0
        assert v["missed"] / max(v["original_visible"], 1) < 0.2
        assert (tmp_path / "pixel_to_vertex_map_96.npz").exists()

    def test_generate_object_assets(self, tmp_path):
        pts = sphere_points()
        afford = (pts[:, 1] > 0).astype(np.float32)
        out = generate_object_assets(
            pts, OBJECT_VIEWS["4MV-Z_HM"], 96, affordance=afford,
            out_dir=str(tmp_path), object_id="obj1",
        )
        assert out["renders"].shape == (4, 96, 96, 3)
        assert out["heatmaps"].shape == (4, 96, 96)
        assert (tmp_path / "p2pmap_obj1_frontleft.npz").exists()


class TestDemoUtils:
    def test_generate_sam_inp_objs_and_lift_dict(self, tmp_path):
        verts, faces = uv_sphere(n_lat=12, n_lon=16)
        paths, lift_path = demo_utils.generate_sam_inp_objs(
            verts * 3.0 + 1.0, faces, str(tmp_path), image_size=96
        )
        assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
        d = demo_utils.load_lift2d_dict(lift_path)
        assert d["num_vertices"] == len(verts)
        assert d["p2v"].shape == (3, 4, 96, 96)  # corner-major, lift.corner_major
        img = np.asarray(Image.open(paths[0]))
        assert (img < 250).any()  # something was rendered

    def test_contact_obj_export(self, tmp_path):
        verts, faces = uv_sphere(n_lat=6, n_lon=8)
        contact = (verts[:, 0] > 0).astype(np.float32)
        path = str(tmp_path / "c.obj")
        demo_utils.export_contact_obj(path, verts, faces, contact)
        lines = open(path).read().splitlines()
        vlines = [l for l in lines if l.startswith("v ")]
        assert len(vlines) == len(verts)
        assert len(vlines[0].split()) == 7  # xyz + rgb

    def test_smpl_to_smplx_conversion(self, tmp_path):
        mapping = np.zeros((5, 3), np.float32)
        mapping[0, 1] = 1.0
        mapping[4, 2] = 0.5
        p = str(tmp_path / "map.pkl")
        with open(p, "wb") as f:
            pickle.dump({"matrix": mapping}, f)
        m = demo_utils.load_smpl_to_smplx_mapping(p)
        out = demo_utils.convert_contacts_smpl_to_smplx(
            np.array([0.0, 1.0, 0.8]), m
        )
        assert out.shape == (5,)
        assert out[0] == 1.0 and out[4] == 0.4

    def test_overlay_grid(self):
        renders = np.full((4, 8, 8, 3), 200, np.uint8)
        masks = np.zeros((4, 8, 8))
        masks[:, 2:4] = 1.0
        grid = demo_utils.overlay_grid(renders, masks)
        assert grid.shape == (16, 16, 3)
        assert (grid[2, 0] != grid[0, 0]).any()  # overlay applied


@pytest.mark.slow
def test_demo_cli_smoke(tmp_path):
    from interactvlm_tpu.demo.run_demo import main

    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(img_dir / "chair__001.jpg")

    out = main([
        "--img_folder", str(img_dir),
        "--output_folder", str(tmp_path / "out"),
        "--contact_type", "hcontact",
        "--random_weights", "--max_new_tokens", "4",
    ])
    assert len(out) == 1
    assert (tmp_path / "out" / "chair__001_pred_masks.npy").exists()


@pytest.mark.slow
def test_demo_cli_output_bundle(tmp_path):
    """The demo CLI ships the reference's full output bundle (reference
    run_demo.py:436-558): contact-colored OBJ, 2x2 mask-overlay grid,
    vertices npz -- and the h2dcontact original-frame mask path."""
    from interactvlm_tpu.demo.run_demo import main
    from interactvlm_tpu.fit.data_io import save_obj_mesh

    rng = np.random.default_rng(0)

    # hcontact: renders + lift maps + body template
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    Image.fromarray(
        rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(img_dir / "chair__001.jpg")
    renders = tmp_path / "renders"
    os.makedirs(renders)
    for name in ("topfront", "bottomfront", "topback", "bottomback"):
        Image.fromarray(
            np.full((64, 64, 3), 128, np.uint8)
        ).save(renders / f"{name}.png")
    NV = 178
    p2v = rng.integers(0, NV, (4, 64, 64, 3)).astype(np.int32)
    p2v[0, 0, 0] = NV - 1  # pin num_vertices
    bary = rng.dirichlet([1, 1, 1], (4, 64, 64)).astype(np.float32)
    np.savez(tmp_path / "maps.npz", p2v=p2v, bary=bary)
    verts, faces = uv_sphere(n_lat=6, n_lon=8)
    body = rng.normal(size=(NV, 3)).astype(np.float32)
    save_obj_mesh(str(tmp_path / "body.obj"), body,
                  np.array([[0, 1, 2], [1, 2, 3]]))

    out_dir = tmp_path / "out_h"
    main([
        "--img_folder", str(img_dir),
        "--output_folder", str(out_dir),
        "--contact_type", "hcontact",
        "--sam_renders_dir", str(renders),
        "--human_maps", str(tmp_path / "maps.npz"),
        "--body_template", str(tmp_path / "body.obj"),
        "--random_weights", "--max_new_tokens", "4",
    ])
    grid = out_dir / "chair__001_hcontact_concat.jpg"
    assert grid.exists()
    g = np.asarray(Image.open(grid))
    assert g.shape == (128, 128, 3)  # 2x2 of 64px renders
    assert (out_dir / "chair__001_hcontact_vertices.npz").exists()
    obj = out_dir / "chair__001_body_with_hcontacts.obj"
    assert obj.exists()
    vlines = [l for l in open(obj).read().splitlines()
              if l.startswith("v ")]
    assert len(vlines) == NV and len(vlines[0].split()) == 7

    # ocontact: object mesh tree -> colored object OBJ + grid
    obj_img_dir = tmp_path / "obj_imgs"
    os.makedirs(obj_img_dir)
    Image.fromarray(
        rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(obj_img_dir / "mug__001.jpg")
    save_obj_mesh(str(obj_img_dir / "object_mesh.obj"), verts, faces)
    out_dir_o = tmp_path / "out_o"
    main([
        "--img_folder", str(obj_img_dir),
        "--output_folder", str(out_dir_o),
        "--contact_type", "ocontact",
        "--random_weights", "--max_new_tokens", "4",
    ])
    oobj = out_dir_o / "mug__001_object_mesh_with_contacts_ocontact.obj"
    assert oobj.exists()
    vlines = [l for l in open(oobj).read().splitlines()
              if l.startswith("v ")]
    assert len(vlines) == len(verts)
    assert (out_dir_o / "mug__001_ocontact_concat.jpg").exists()

    # h2dcontact: original-frame mask + photo overlay
    out_dir_2d = tmp_path / "out_2d"
    main([
        "--img_folder", str(img_dir),
        "--output_folder", str(out_dir_2d),
        "--contact_type", "h2dcontact",
        "--random_weights", "--max_new_tokens", "4",
    ])
    om = out_dir_2d / "chair__001_pred_mask_original.npy"
    assert om.exists()
    assert np.load(om).shape == (40, 40)
    ov = out_dir_2d / "chair__001_h2dcontact_overlay.jpg"
    assert ov.exists()
    assert np.asarray(Image.open(ov)).shape == (40, 40, 3)
