"""Fitting-module tests: rot6d round-trip, Umeyama alignment recovery, ICP
convergence on a known transform, differentiable silhouette, and an
end-to-end synthetic pose fit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.fit.icp import (
    SimilarityTransform,
    apply_similarity_transform,
    corresponding_points_alignment,
    icp,
    nearest_neighbors,
)
from interactvlm_tpu.fit.optimizer import (
    FitParams,
    LossWeights,
    contact_loss,
    mask_iou_loss,
    run_fit,
)
from interactvlm_tpu.fit.renderer import (
    project_perspective,
    render_silhouette,
)
from interactvlm_tpu.fit.utils import (
    apply_transformation,
    calculate_centroid,
    compute_vertex_normals,
    matrix_to_rot6d,
    rot6d_to_matrix,
)
from tests.test_geometry import uv_sphere


def random_rotation(seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q.astype(np.float32)


class TestRotUtils:
    def test_rot6d_roundtrip(self):
        R = random_rotation(1)
        r6 = matrix_to_rot6d(jnp.asarray(R))
        R2 = rot6d_to_matrix(r6)
        assert np.allclose(np.asarray(R2), R, atol=1e-5)

    def test_apply_transformation(self):
        R = random_rotation(2)
        v = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
        out = apply_transformation(
            v, matrix_to_rot6d(jnp.asarray(R)), jnp.array([1.0, 2.0, 3.0]),
            jnp.asarray(2.0),
        )
        want = (np.asarray(v) @ R.T) * 2.0 + np.array([1, 2, 3])
        assert np.allclose(np.asarray(out), want, atol=1e-4)

    def test_vertex_normals_sphere(self):
        verts, faces = uv_sphere(n_lat=12, n_lon=16)
        n = np.asarray(
            compute_vertex_normals(jnp.asarray(verts), jnp.asarray(faces))
        )
        radial = verts / np.linalg.norm(verts, axis=1, keepdims=True)
        cos = (n * radial).sum(1)
        assert (np.abs(cos) > 0.9).mean() > 0.95


class TestAlignment:
    def test_umeyama_recovers_transform(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(50, 3)).astype(np.float32)
        R = random_rotation(3)
        s, T = 1.7, np.array([0.3, -0.2, 0.5], np.float32)
        Y = s * X @ R + T
        out = corresponding_points_alignment(
            jnp.asarray(X), jnp.asarray(Y), estimate_scale=True
        )
        assert np.allclose(np.asarray(out.R), R, atol=1e-4)
        assert np.allclose(np.asarray(out.T), T, atol=1e-4)
        assert np.isclose(float(out.s), s, atol=1e-4)

    def test_nearest_neighbors(self):
        q = jnp.asarray([[0.0, 0, 0], [5, 5, 5]])
        r = jnp.asarray([[4.9, 5, 5], [0.1, 0, 0], [9, 9, 9]])
        nn = np.asarray(nearest_neighbors(q, r))
        assert list(nn) == [1, 0]

    def test_icp_recovers_small_transform(self):
        verts, faces = uv_sphere(n_lat=10, n_lon=14)
        hum = verts
        angle = np.deg2rad(10)
        R = np.array(
            [[np.cos(angle), -np.sin(angle), 0],
             [np.sin(angle), np.cos(angle), 0],
             [0, 0, 1]], dtype=np.float32,
        )
        obj = hum @ R + np.array([0.05, -0.03, 0.02], np.float32)
        sol = icp(
            jnp.asarray(obj), jnp.asarray(hum), max_iterations=50
        )
        # transformed object points land on the human cloud
        d = np.linalg.norm(np.asarray(sol.Xt)[:, None] - hum[None], axis=-1)
        assert d.min(axis=1).mean() < 0.02


class TestRenderer:
    def test_projection_center(self):
        v = jnp.asarray([[0.0, 0.0, 2.0]])
        xy, z = project_perspective(v, (100.0, 100.0), (32.0, 32.0))
        assert np.allclose(np.asarray(xy)[0], [32, 32])
        assert float(z[0]) == 2.0

    def test_silhouette_coverage_and_gradient(self):
        verts, faces = uv_sphere(n_lat=10, n_lon=14, radius=0.5)
        verts = verts + np.array([0, 0, 3.0], np.float32)
        S = 64
        focal = (80.0, 80.0)
        pp = (S / 2, S / 2)
        sil = render_silhouette(
            jnp.asarray(-verts * np.array([1, 1, -1])),  # flip convention
            jnp.asarray(faces), focal, pp, S,
        )
        sil_np = np.asarray(sil)
        assert 0.05 < sil_np.mean() < 0.9
        assert sil_np.max() > 0.9

        def loss(v):
            s = render_silhouette(v, jnp.asarray(faces), focal, pp, S)
            return s.sum()

        g = jax.grad(loss)(jnp.asarray(-verts * np.array([1, 1, -1],
                                                         np.float32)))
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


    def test_phong_render_shading(self):
        from interactvlm_tpu.fit.renderer import render_phong

        verts, faces = uv_sphere(n_lat=12, n_lon=16, radius=0.5)
        verts = verts + np.array([0, 0, 3.0], np.float32)
        verts = -verts * np.array([1, 1, -1], np.float32)  # flip convention
        S = 64
        img = np.asarray(render_phong(
            jnp.asarray(verts), jnp.asarray(faces),
            (80.0, 80.0), (S / 2, S / 2), S,
        ))
        assert img.shape == (S, S, 4)
        alpha = img[..., 3]
        assert 0.05 < alpha.mean() < 0.9  # sphere covers part of the frame
        # shading varies across the surface (not flat)
        lit = img[..., :3][alpha > 0]
        assert lit.std() > 0.02
        # background is exactly black / alpha 0
        assert img[..., :3][alpha == 0].max() == 0.0

    def test_save_fit_video(self, tmp_path):
        from interactvlm_tpu.fit.fit import save_fit_video
        from interactvlm_tpu.fit.utils import matrix_to_rot6d as m2r

        verts, faces = uv_sphere(n_lat=8, n_lon=10, radius=0.4)
        n_steps = 7
        # params move each step so the GIF frames differ (PIL merges
        # identical consecutive frames)
        hist = FitParams(
            rot6d=jnp.tile(m2r(jnp.eye(3))[None], (n_steps, 1)),
            translation=jnp.stack([
                jnp.asarray([0.1 * i, 0.0, 3.0]) for i in range(n_steps)
            ]),
            log_scale=jnp.zeros((n_steps,)),
        )
        scene = {
            "obj_verts": jnp.asarray(verts),
            "obj_faces": jnp.asarray(faces),
            "target_mask": jnp.zeros((64, 64)).at[20:40, 20:40].set(1.0),
            "focal": jnp.asarray([80.0, 80.0]),
            "princpt": jnp.asarray([32.0, 32.0]),
            "centroid_offset": jnp.zeros(3),
        }
        out = str(tmp_path / "fit.gif")
        save_fit_video(scene, hist, out, image_size=64, every=3)
        from PIL import Image

        im = Image.open(out)
        assert im.n_frames == 3  # steps 0, 3, 6 (6 is already the last)


class TestFitLoop:
    def test_contact_and_iou_losses(self):
        o = jnp.zeros((4, 3))
        h = jnp.ones((5, 3))
        cl = contact_loss(o, h, jnp.ones(4), jnp.ones(5))
        assert np.isclose(float(cl), np.sqrt(3), atol=1e-4)
        m = jnp.ones((8, 8))
        assert float(mask_iou_loss(m, m)) == pytest.approx(0.5)

    @pytest.mark.slow
    def test_synthetic_pose_recovery(self):
        """Optimize the object toward a human contact cloud: contact loss
        alone should pull a displaced sphere back onto the target region."""
        verts, faces = uv_sphere(n_lat=8, n_lon=12, radius=0.3)
        hum_v, hum_f = uv_sphere(n_lat=8, n_lon=12, radius=0.5)
        hum_v = hum_v + np.array([0, 0, 3.0], np.float32)

        scene = {
            "obj_verts": verts,
            "obj_faces": faces,
            "hum_verts": hum_v,
            "hum_faces": hum_f,
            "obj_contact_probs": np.ones(len(verts), np.float32),
            "hum_contact_probs": np.ones(len(hum_v), np.float32),
            "target_mask": np.zeros((64, 64), np.float32),
            "focal": np.array([80.0, 80.0], np.float32),
            "princpt": np.array([32.0, 32.0], np.float32),
            "centroid_offset": np.zeros(3, np.float32),
            "target_centroid": np.array([32.0, 32.0], np.float32),
        }
        scene = {k: jnp.asarray(v) for k, v in scene.items()}
        init = FitParams(
            rot6d=jnp.asarray([1.0, 0, 0, 0, 1.0, 0]),
            translation=jnp.asarray([1.5, 1.5, 1.0]),
            log_scale=jnp.zeros(()),
        )
        w = LossWeights(
            mask_w=0.0, mask_kick_in=-1,
            centroid_w=0.0, centroid_kick_in=-1,
            contact_w=1.0, contact_kick_in=0,
        )
        best, best_loss, hist, _ = run_fit(
            init, scene, w, num_steps=150, image_size=64,
        )
        assert float(hist[-1]) < float(hist[0]) * 0.5
        final_t = np.asarray(best.translation)
        # object center should approach the human center (0, 0, 3)
        assert np.linalg.norm(final_t - np.array([0, 0, 3.0])) < 0.6


def test_fit_human_object_writes_video(tmp_path):
    """video_path wiring: fit_human_object renders the trajectory GIF."""
    from interactvlm_tpu.fit.fit import fit_human_object

    overts, ofaces = uv_sphere(n_lat=8, n_lon=10, radius=0.3)
    hverts, hfaces = uv_sphere(n_lat=8, n_lon=10, radius=0.5)
    hverts = hverts + np.array([0, 0, 3.0], np.float32)
    S = 64
    mask = np.zeros((S, S), np.float32)
    mask[20:40, 25:45] = 1.0
    scene = {
        "obj_verts": overts, "obj_faces": ofaces,
        "hum_verts": hverts, "hum_faces": hfaces,
        "obj_contact_probs": (overts[:, 1] > 0.2).astype(np.float32),
        "hum_contact_probs": (hverts[:, 1] < 2.8).astype(np.float32),
        "target_mask": mask, "focal": np.array([80.0, 80.0]),
        "princpt": np.array([S / 2, S / 2], np.float32),
        "centroid_offset": np.zeros(3, np.float32),
    }
    out = str(tmp_path / "traj.gif")
    best, diag = fit_human_object(
        scene, num_steps=12, image_size=S, use_icp=False,
        video_path=out, video_every=5,
    )
    assert diag["video_path"] == out
    from PIL import Image

    assert Image.open(out).size == (S, S)
    assert np.isfinite(float(diag["best_loss"]))
