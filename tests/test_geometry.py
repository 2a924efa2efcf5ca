"""Geometry core tests: cameras, rasterizer, and the 2D<->3D lift.

The round-trip invariant mirrors the reference's
``verify_contact_reconstruction_diff`` (render_mesh_utils.py:200-235):
project GT contact vertices to multi-view masks, lift them back, and check
the reconstructed vertex set against the original.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.geometry import (
    HUMAN_VIEWS,
    OBJECT_VIEWS,
    build_lift_maps,
    contact_mask_from_fragments,
    corner_major,
    lift_multiview_points,
    lift_multiview_soft,
    lift_multiview_thresholded,
    rasterize_mesh,
)
from interactvlm_tpu.geometry.cameras import (
    camera_from_params,
    project_points,
)
from interactvlm_tpu.geometry.rasterizer import pick_window
from interactvlm_tpu.geometry.views import normalize_cam_params


def uv_sphere(n_lat=24, n_lon=32, radius=0.8):
    """Simple UV sphere mesh (poles + quads split into triangles)."""
    verts = [(0.0, radius, 0.0)]
    for i in range(1, n_lat):
        theta = np.pi * i / n_lat
        for j in range(n_lon):
            phi = 2 * np.pi * j / n_lon
            verts.append(
                (
                    radius * np.sin(theta) * np.cos(phi),
                    radius * np.cos(theta),
                    radius * np.sin(theta) * np.sin(phi),
                )
            )
    verts.append((0.0, -radius, 0.0))
    verts = np.array(verts, dtype=np.float32)

    faces = []
    # top cap
    for j in range(n_lon):
        faces.append((0, 1 + j, 1 + (j + 1) % n_lon))
    # bands
    for i in range(n_lat - 2):
        ring0 = 1 + i * n_lon
        ring1 = 1 + (i + 1) * n_lon
        for j in range(n_lon):
            a = ring0 + j
            b = ring0 + (j + 1) % n_lon
            c = ring1 + j
            d = ring1 + (j + 1) % n_lon
            faces.append((a, c, b))
            faces.append((b, c, d))
    # bottom cap
    last = len(verts) - 1
    ring = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        faces.append((last, ring + (j + 1) % n_lon, ring + j))
    return verts, np.array(faces, dtype=np.int32)


class TestCameras:
    def test_origin_projects_to_center(self):
        S = 64
        R, T = camera_from_params(jnp.array([2.0, 30.0, 45.0, 0.0, 0.0]))
        pix, z = project_points(jnp.zeros((1, 3)), R, T, S)
        assert np.allclose(np.asarray(pix)[0], (S - 1) / 2, atol=1e-4)
        assert np.isclose(float(z[0]), 2.0, atol=1e-5)

    def test_depth_increases_away_from_camera(self):
        R, T = camera_from_params(jnp.array([2.0, 0.0, 0.0, 0.0, 0.0]))
        # camera sits at +z=2 looking toward origin along -z... points with
        # larger world z are closer to the camera.
        pts = jnp.array([[0.0, 0.0, 0.5], [0.0, 0.0, -0.5]])
        _, z = project_points(pts, R, T, 64)
        assert float(z[0]) < float(z[1])

    def test_view_registry(self):
        hv = HUMAN_VIEWS["4MV-Z_Vitru_mv2"]
        assert hv.num_views == 4 and hv.num_vertices == 6890
        assert hv.names == ("topfront", "bottomfront", "topback", "bottomback")
        cams = hv.cam_params()
        assert cams.shape == (4, 5)
        assert cams[1][4] == pytest.approx(0.3)  # bottomfront ty
        ov = OBJECT_VIEWS["10MV-Z_HM"]
        assert ov.num_views == 10 and ov.heatmap

    def test_normalize_cam_params(self):
        # exact reference semantics (base_contact_dataset.py:37-50)
        p = np.array([[2.0, 315.0, 135.0, 0.0, 0.3]])
        n = normalize_cam_params(p)
        assert n[0, 0] == pytest.approx(2.0 / 10.0)
        assert n[0, 1] == pytest.approx(315.0 / 360.0)
        assert n[0, 2] == pytest.approx(135.0 / 360.0)
        assert n[0, 3] == pytest.approx(0.5)
        assert n[0, 4] == pytest.approx(0.65)


class TestRasterizer:
    def test_single_triangle_center_hit(self):
        S = 32
        verts = jnp.array(
            [[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0]],
            dtype=jnp.float32,
        )
        faces = jnp.array([[0, 1, 2]], dtype=jnp.int32)
        cam = jnp.array([2.0, 0.0, 0.0, 0.0, 0.0])
        p2f, bary, zbuf = rasterize_mesh(verts, faces, cam, S, window=S)
        p2f = np.asarray(p2f)
        assert p2f[S // 2, S // 2] == 0  # center covered
        assert (p2f >= 0).sum() > 20
        # barycentrics sum to 1 on covered pixels
        covered = p2f >= 0
        s = np.asarray(bary).sum(-1)
        assert np.allclose(s[covered], 1.0, atol=1e-4)
        assert np.all(np.asarray(zbuf)[covered] > 0)

    def test_depth_ordering(self):
        S = 32
        # two stacked triangles; the nearer one (larger world z, camera at
        # +z) must win the z-buffer.
        verts = jnp.array(
            [
                [-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.6, 0.0],  # far
                [-0.5, -0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.6, 0.5],  # near
            ],
            dtype=jnp.float32,
        )
        faces = jnp.array([[0, 1, 2], [3, 4, 5]], dtype=jnp.int32)
        cam = jnp.array([2.0, 0.0, 0.0, 0.0, 0.0])
        p2f, _, _ = rasterize_mesh(verts, faces, cam, S, window=S)
        center = int(np.asarray(p2f)[S // 2, S // 2])
        assert center == 1

    def test_sphere_coverage_and_silhouette(self):
        verts, faces = uv_sphere()
        S = 96
        w = pick_window(verts, faces, np.array([2.0, 45.0, 315.0, 0, 0]), S)
        p2f, bary, _ = rasterize_mesh(
            jnp.asarray(verts), jnp.asarray(faces),
            jnp.array([2.0, 45.0, 315.0, 0.0, 0.0]), S, window=w,
        )
        p2f = np.asarray(p2f)
        covered = p2f >= 0
        frac = covered.mean()
        # sphere of radius .8 at dist 2 with fov 60 covers a sizable disk
        assert 0.1 < frac < 0.9
        # silhouette should be a filled disk: interior of the bounding box of
        # coverage has no holes
        ys, xs = np.where(covered)
        cy, cx = ys.mean(), xs.mean()
        ry = (ys.max() - ys.min()) / 4
        inner = covered[
            int(cy - ry) : int(cy + ry), int(cx - ry) : int(cx + ry)
        ]
        assert inner.all(), "holes inside the silhouette"


@pytest.fixture(scope="module")
def sphere_maps():
    verts, faces = uv_sphere()
    S = 96
    cams = np.stack(
        [
            [2.0, 45.0, 315.0, 0.0, 0.0],
            [2.0, 45.0, 45.0, 0.0, 0.0],
            [2.0, 330.0, 135.0, 0.0, 0.0],
            [2.0, 330.0, 225.0, 0.0, 0.0],
        ]
    ).astype(np.float32)
    w = max(pick_window(verts, faces, c, S) for c in cams)
    p2v, bary, p2f = build_lift_maps(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(cams), S, w
    )
    return verts, faces, np.asarray(p2v), np.asarray(bary), np.asarray(p2f)


class TestLift:

    def test_roundtrip_contact_reconstruction(self, sphere_maps):
        """Project GT contact to masks, lift back, compare vertex sets
        (reference render_mesh_utils.py:200-235 semantics)."""
        verts, faces, p2v, bary, p2f = sphere_maps
        N = len(verts)
        contact = (verts[:, 0] > 0.3)  # a cap on the +x side
        assert contact.sum() > 30

        masks = np.stack(
            [
                np.asarray(
                    contact_mask_from_fragments(
                        jnp.asarray(p2f[v]), jnp.asarray(faces),
                        jnp.asarray(contact), min_vertices=2,
                    )
                )
                for v in range(4)
            ]
        )
        logits = np.where(masks, 20.0, -20.0).astype(np.float32)
        lifted = np.asarray(
            lift_multiview_soft(
                jnp.asarray(logits), jnp.asarray(corner_major(p2v)), jnp.asarray(corner_major(bary)), N
            )
        )
        recon = set(np.where(lifted > 0.5)[0])
        orig = set(np.where(contact)[0])
        # visible vertices: those referenced by any view's p2v map
        visible = set(np.unique(p2v[p2v >= 0]))
        orig_visible = orig & visible
        missed = orig_visible - recon
        extra = recon - orig
        assert len(missed) / max(len(orig_visible), 1) < 0.15
        assert len(extra) / max(len(recon), 1) < 0.25

    def test_soft_lift_in_range_and_empty(self, sphere_maps):
        verts, faces, p2v, bary, _ = sphere_maps
        N = len(verts)
        logits = jnp.full(p2v.shape[:3], -20.0)
        out = lift_multiview_soft(logits, jnp.asarray(corner_major(p2v)), jnp.asarray(corner_major(bary)), N)
        assert float(jnp.max(out)) < 1e-4
        logits = jnp.full(p2v.shape[:3], 20.0)
        out = np.asarray(
            lift_multiview_soft(logits, jnp.asarray(corner_major(p2v)), jnp.asarray(corner_major(bary)), N)
        )
        visible = np.unique(np.asarray(p2v)[np.asarray(p2v) >= 0])
        assert np.allclose(out[visible], 1.0, atol=1e-3)

    def test_thresholded_lift_gradient_flows(self, sphere_maps):
        verts, faces, p2v, bary, _ = sphere_maps
        N = len(verts)
        logits = jnp.full(p2v.shape[:3], 2.0)

        def loss(lg):
            return lift_multiview_thresholded(
                lg, jnp.asarray(corner_major(p2v)), jnp.asarray(corner_major(bary)), N
            ).sum()

        g = jax.grad(loss)(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0

    def test_point_lift(self):
        # 2 views, 4x4 pixels, 8 points
        p2p = -np.ones((2, 4, 4), dtype=np.int32)
        p2p[0, 0, 0] = 3
        p2p[0, 0, 1] = 3
        p2p[1, 2, 2] = 3
        p2p[1, 3, 3] = 5
        vals = np.zeros((2, 4, 4), dtype=np.float32)
        vals[0, 0, 0] = 1.0
        vals[0, 0, 1] = 0.5
        vals[1, 2, 2] = 0.25
        vals[1, 3, 3] = 0.8
        out = np.asarray(
            lift_multiview_points(jnp.asarray(vals), jnp.asarray(p2p), 8)
        )
        # point 3: view0 mean .75, view1 mean .25 -> .5 ; point 5: .8
        assert out[3] == pytest.approx(0.5, abs=1e-5)
        assert out[5] == pytest.approx(0.8, abs=1e-5)
        assert out[0] == 0.0

    def test_lift_soft_matches_loop_reference(self, sphere_maps):
        """Cross-check the fused scatter against a literal numpy loop
        transcription of the reference predictor."""
        verts, faces, p2v, bary, _ = sphere_maps
        N = len(verts)
        rng = np.random.default_rng(0)
        logits = rng.normal(size=p2v.shape[:3]).astype(np.float32) * 5

        got = np.asarray(
            lift_multiview_soft(
                jnp.asarray(logits), jnp.asarray(corner_major(p2v)), jnp.asarray(corner_major(bary)), N
            )
        )

        # literal reference loop (components.py:246-277)
        pred = np.zeros(N)
        count = np.zeros(N)
        for v in range(4):
            probs = 1 / (1 + np.exp(-np.clip(logits[v], -20, 20)))
            vv = p2v[v].reshape(-1, 3)
            ww = bary[v].reshape(-1, 3).astype(np.float64)
            mm = probs.reshape(-1)
            ok = ((vv >= 0) & (vv < N)).all(1)
            vv, ww, mm = vv[ok], ww[ok], mm[ok]
            votes = np.zeros(N)
            wsum = np.zeros(N)
            for i in range(3):
                np.add.at(votes, vv[:, i], ww[:, i] * mm)
                np.add.at(wsum, vv[:, i], ww[:, i])
            seen = wsum > 0
            votes[seen] /= wsum[seen]
            pred += votes
            count += seen
        seen = count > 0
        pred[seen] /= count[seen]
        pred = np.clip(pred, 0, 1)

        assert np.allclose(got, pred, atol=2e-4)


class TestGatherLift:
    def test_gather_matches_scatter(self, ):
        from interactvlm_tpu.geometry.lift import (
            build_gather_maps,
            lift_multiview_soft,
            lift_multiview_soft_gather,
        )

        rng = np.random.default_rng(0)
        V, H, W, N = 3, 24, 24, 50
        p2v = rng.integers(-1, N, (V, H, W, 3)).astype(np.int32)
        bary = rng.dirichlet([1, 1, 1], (V, H, W)).astype(np.float32)
        logits = rng.normal(size=(V, H, W)).astype(np.float32) * 4
        want = np.asarray(
            lift_multiview_soft(jnp.asarray(logits),
                                jnp.asarray(corner_major(p2v)),
                                jnp.asarray(corner_major(bary)), N)
        )
        idx, w = build_gather_maps(p2v, bary, N)
        got = np.asarray(
            lift_multiview_soft_gather(jnp.asarray(logits), idx, w)
        )
        assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()

    def test_lowres_gather_matches_upsample_then_gather(self):
        """The low-res lift must equal bilinear-upsample (jax.image.resize
        half-pixel convention, as InteractVLM.upsample_masks) followed by
        the full-res gather -- pointwise evaluation of the same function."""
        from interactvlm_tpu.geometry.lift import (
            build_gather_maps,
            lift_multiview_soft_gather,
            lift_multiview_soft_gather_lowres,
        )

        rng = np.random.default_rng(1)
        V, H, W, N = 3, 64, 64, 50
        h = w = 16
        p2v = rng.integers(-1, N, (V, H, W, 3)).astype(np.int32)
        bary = rng.dirichlet([1, 1, 1], (V, H, W)).astype(np.float32)
        low = rng.normal(size=(V, h, w)).astype(np.float32) * 6
        idx, wg = build_gather_maps(p2v, bary, N)

        full = jax.image.resize(
            jnp.asarray(low), (V, H, W), method="bilinear"
        )
        want = np.asarray(lift_multiview_soft_gather(full, idx, wg))
        got = np.asarray(
            lift_multiview_soft_gather_lowres(
                jnp.asarray(low), idx, wg, (H, W)
            )
        )
        assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()

    def test_lowres_gather_non_square_scale(self):
        """Edge taps clamp exactly like resize's normalized triangle
        kernel, including at a non-integer scale factor."""
        from interactvlm_tpu.geometry.lift import (
            build_gather_maps,
            lift_multiview_soft_gather,
            lift_multiview_soft_gather_lowres,
        )

        rng = np.random.default_rng(2)
        V, H, W, N = 2, 48, 40, 30  # scales 4.8 and ~2.857: non-integer
        h, w = 10, 14
        p2v = rng.integers(-1, N, (V, H, W, 3)).astype(np.int32)
        bary = rng.dirichlet([1, 1, 1], (V, H, W)).astype(np.float32)
        low = rng.normal(size=(V, h, w)).astype(np.float32) * 6
        idx, wg = build_gather_maps(p2v, bary, N)
        full = jax.image.resize(
            jnp.asarray(low), (V, H, W), method="bilinear"
        )
        want = np.asarray(lift_multiview_soft_gather(full, idx, wg))
        got = np.asarray(
            lift_multiview_soft_gather_lowres(
                jnp.asarray(low), idx, wg, (H, W)
            )
        )
        assert np.allclose(got, want, atol=1e-5), np.abs(got - want).max()



class TestBatchedLift:
    """The batched rank-1-scatter forms must equal a per-sample vmap of the
    single-sample lifts (which XLA would otherwise batch into a scatter
    whose layout pads 64x on TPU — geometry/lift._batched_normalized_scatter).
    """

    def test_batch_soft_matches_vmap(self, sphere_maps):
        from interactvlm_tpu.geometry.lift import lift_batch_soft

        verts, faces, p2v, bary, _ = sphere_maps
        N = len(verts)
        rng = np.random.default_rng(3)
        logits = rng.normal(size=(3,) + p2v.shape[:3]).astype(np.float32) * 5
        p3 = jnp.asarray(corner_major(p2v))
        b3 = jnp.asarray(corner_major(bary))
        want = jax.vmap(
            lambda lg: lift_multiview_soft(lg, p3, b3, N)
        )(jnp.asarray(logits))
        got = lift_batch_soft(jnp.asarray(logits), p3, b3, N)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)
        # active mask zeroes inactive rows
        act = jnp.asarray([True, False, True])
        got2 = lift_batch_soft(jnp.asarray(logits), p3, b3, N, active=act)
        assert np.abs(np.asarray(got2)[1]).max() == 0
        np.testing.assert_allclose(np.asarray(got2)[0],
                                   np.asarray(want)[0], atol=1e-5)

    def test_batch_thresholded_matches_vmap(self, sphere_maps):
        from interactvlm_tpu.geometry.lift import lift_batch_thresholded

        verts, faces, p2v, bary, _ = sphere_maps
        N = len(verts)
        rng = np.random.default_rng(4)
        B = 2
        logits = rng.normal(size=(B,) + p2v.shape[:3]).astype(np.float32) * 3
        # per-sample maps: roll the shared maps to fake two different sets
        p2v_b = np.stack([p2v, np.roll(p2v, 1, axis=1)])
        bary_b = np.stack([bary, np.roll(bary, 1, axis=1)])
        p3 = jnp.asarray(np.moveaxis(p2v_b, -1, 0))
        b3 = jnp.asarray(np.moveaxis(bary_b, -1, 0))
        want = jax.vmap(
            lambda lg, p, b: lift_multiview_thresholded(lg, p, b, N),
            in_axes=(0, 1, 1),
        )(jnp.asarray(logits), p3, b3)
        got = lift_batch_thresholded(jnp.asarray(logits), p3, b3, N)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_batch_points_matches_vmap(self):
        from interactvlm_tpu.geometry.lift import lift_batch_points

        rng = np.random.default_rng(5)
        B, V, H, W, P = 3, 2, 8, 8, 16
        vals = rng.random((B, V, H, W)).astype(np.float32)
        p2p = rng.integers(-1, P, (B, V, H, W)).astype(np.int32)
        want = jax.vmap(
            lambda v, m: lift_multiview_points(v, m, P)
        )(jnp.asarray(vals), jnp.asarray(p2p))
        got = lift_batch_points(jnp.asarray(vals), jnp.asarray(p2p), P)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_batch_soft_gradient_finite(self, sphere_maps):
        from interactvlm_tpu.geometry.lift import lift_batch_soft

        verts, faces, p2v, bary, _ = sphere_maps
        N = len(verts)
        p3 = jnp.asarray(corner_major(p2v))
        b3 = jnp.asarray(corner_major(bary))
        logits = jnp.ones((2,) + p2v.shape[:3]) * 0.3

        g = jax.grad(
            lambda lg: lift_batch_soft(lg, p3, b3, N).sum()
        )(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
