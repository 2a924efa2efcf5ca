"""Evaluate-driver tests: generate-mode batch evaluation on the tiny model,
validate loop, and the DAMON reports."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.config import interactvlm_tiny
from interactvlm_tpu.eval.evaluate import (
    damon_binary_contact,
    damon_semantic_contact,
    evaluate_batch,
    truncate_at_answer,
    validate,
)
from interactvlm_tpu.models.interactvlm import InteractVLM
from interactvlm_tpu.utils.constants import IGNORE_INDEX
from tests.test_interactvlm import MASK, make_batch


@pytest.fixture(scope="module")
def tiny():
    cfg = interactvlm_tiny()
    model = InteractVLM(cffg := cfg)
    batch = make_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    return cfg, model, params


def test_truncate_at_answer():
    ids = np.arange(10)[None]
    labels = np.full((1, 10), IGNORE_INDEX)
    labels[0, 6:] = 1
    out, mask = truncate_at_answer(ids, labels)
    assert out.shape == (1, 6)
    assert mask.sum() == 6
    # no supervised tokens -> unchanged
    out, mask = truncate_at_answer(ids, np.full((1, 10), IGNORE_INDEX))
    assert out.shape == (1, 10)
    assert mask.all()


def test_truncate_at_answer_ragged_rows():
    """Each row is cut at ITS OWN answer start (not row 0's)."""
    ids = np.tile(np.arange(10)[None], (2, 1))
    labels = np.full((2, 10), IGNORE_INDEX)
    labels[0, 6:] = 1  # row 0 answer starts at 6
    labels[1, 3:] = 1  # row 1 answer starts at 3
    out, mask = truncate_at_answer(ids, labels, pad_id=0)
    assert out.shape == (2, 6)
    assert list(mask.sum(axis=1)) == [6, 3]
    assert (out[1, 3:] == 0).all()  # padded tail
    assert (out[1, :3] == ids[1, :3]).all()


def test_evaluate_batch_shapes(tiny):
    cfg, model, params = tiny
    batch = make_batch(cfg)
    human_maps = {
        "p2v": batch["human_p2v"], "bary": batch["human_bary"],
        "num_vertices": cfg.num_human_vertices,
    }
    out = evaluate_batch(
        model, params, batch, cfg, MASK, contact_type="hcontact",
        max_new_tokens=4, human_maps=human_maps,
    )
    B = batch["input_ids"].shape[0]
    assert out["generated_ids"].shape == (B, 4)
    assert out["pred_masks"].shape == (B, 4, MASK, MASK)
    assert out["pred_contact_3d"].shape == (B, cfg.num_human_vertices)
    assert np.isfinite(out["pred_masks"]).all()


def test_validate_loop_and_metrics(tiny):
    cfg, model, params = tiny
    batch = make_batch(cfg, tasks=(2, 2))  # all hcontact
    meta = {
        "image_paths": ["a.jpg", "b.jpg"],
        "sampled_classes_list": [["chair"], ["bench"]],
    }
    human_maps = {
        "p2v": batch["human_p2v"], "bary": batch["human_bary"],
        "num_vertices": cfg.num_human_vertices,
    }
    dist = np.abs(
        np.arange(cfg.num_human_vertices)[:, None]
        - np.arange(cfg.num_human_vertices)[None, :]
    ).astype(float)
    results, saved = validate(
        [(batch, meta)], model, params, cfg, "hcontact", MASK,
        human_maps=human_maps, dist_matrix=dist,
    )
    for k in ("giou", "ciou", "f1", "precision", "recall", "geo"):
        assert k in results and np.isfinite(results[k]), k
    assert len(saved["pred"]) == 2

    # DAMON reports run on the saved results
    binary = damon_binary_contact(saved)
    assert binary["num_images"] == 2
    assert 0 <= binary["f1"] <= 1
    semantic = damon_semantic_contact(saved)
    assert "chair" in semantic["objectwise"]
    assert semantic["categories"].get("furniture", {}).get(
        "num_samples", 0
    ) >= 1  # chair + bench are furniture


def test_damon_binary_union_logic():
    saved = {
        "imgnames": [["img1"], ["img1"], ["img2"]],
        "pred": [np.array([1, 0, 0], bool), np.array([0, 1, 0], bool),
                 np.array([1, 1, 1], bool)],
        "gt": [np.array([1, 0, 0], bool), np.array([0, 1, 0], bool),
               np.array([1, 1, 1], bool)],
        "f1": [1.0, 1.0, 1.0],
        "geo": [0.1, 0.3, 0.0],
        "objnames": [[["chair"]], [["bench"]], [["chair"]]],
    }
    out = damon_binary_contact(saved)
    assert out["num_images"] == 2
    assert out["f1"] == pytest.approx(1.0)
    # per-image geo takes the max over objects
    assert out["geo"] == pytest.approx((0.3 + 0.0) / 2)


def test_original_frame_eval_h2dcontact(tmp_path):
    """Real-photo 2D eval postprocesses low-res masks to the ORIGINAL image
    frame (crop pad + resize, reference sam.py:137-172) and scores against
    the full-resolution label (VERDICT r1 item 6 wiring)."""
    import os
    import pickle
    from os.path import join

    from PIL import Image as _I

    from interactvlm_tpu.data.collate import collate
    from interactvlm_tpu.data.datasets import H2DContactDataset
    from interactvlm_tpu.utils.testing import WhitespaceTokenizer

    root = str(tmp_path)
    rng = np.random.default_rng(0)
    os.makedirs(join(root, "images"), exist_ok=True)
    _I.fromarray(
        rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)
    ).save(join(root, "images", "pic.jpg"))
    h2 = join(root, "hcontact_2d")
    os.makedirs(join(h2, "masks"), exist_ok=True)
    with open(join(h2, "index.pkl"), "wb") as f:
        pickle.dump({"train": [{"image": "pic.jpg", "mask": "m.png",
                                "class_name": "chair"}]}, f)
    m = np.zeros((40, 52), np.uint8)
    m[10:25, 8:30] = 255
    _I.fromarray(m).save(join(h2, "masks", "m.png"))

    cfg = interactvlm_tiny()
    model = InteractVLM(cfg)
    ds = H2DContactDataset(root, image_size=cfg.sam.img_size, clip_size=28)
    tok = WhitespaceTokenizer()
    batch, meta = collate([ds[0]], tok, max_len=200 + 255,
                          multiview_channels=4)
    params = model.init(jax.random.PRNGKey(0), batch)
    results, _ = validate(
        [(batch, meta)], model, params, cfg, "h2dcontact",
        mask_size=cfg.sam.img_size,
    )
    # the metric ran in the ORIGINAL 40x52 frame and is finite
    assert np.isfinite(results["giou"])
    assert np.isfinite(results["ciou"])


def test_distributed_eval_matches_single(tiny):
    """Sharding the eval batch over the 8-device data axis must reproduce
    the single-process metrics exactly (reference DistributedSampler +
    all_gather, evaluate.py:202-222,346; VERDICT r1 item 8)."""
    from interactvlm_tpu.parallel.mesh import create_mesh

    cfg, model, params = tiny
    batch = make_batch(cfg, B=4, tasks=(2, 2, 2, 2))
    meta = {
        "image_paths": [f"{i}.jpg" for i in range(4)],
        "sampled_classes_list": [["chair"]] * 4,
    }
    human_maps = {
        "p2v": batch["human_p2v"], "bary": batch["human_bary"],
        "num_vertices": cfg.num_human_vertices,
    }
    single, _ = validate(
        [(batch, meta)], model, params, cfg, "hcontact", MASK,
        human_maps=human_maps,
    )
    mesh = create_mesh(n_data=4, n_model=2)
    with mesh:
        sharded, _ = validate(
            [(batch, meta)], model, params, cfg, "hcontact", MASK,
            human_maps=human_maps, mesh=mesh,
        )
    for k in single:
        assert sharded[k] == pytest.approx(single[k], abs=2e-3), k


def test_per_sample_geo_is_not_batch_mean(tiny):
    """saved["geo"] must hold PER-SAMPLE geodesic FP distances (VERDICT r2
    #4): two rows with different GT/pred must record different geo values,
    not a shared batch mean."""
    cfg, model, params = tiny
    batch = make_batch(cfg, tasks=(2, 2))
    # make row GT maximally different
    gt = np.zeros((2, cfg.num_human_vertices), np.float32)
    gt[0, :3] = 1.0
    gt[1, 5:6] = 1.0  # asymmetric vs row 0
    batch["gt_hcontact"] = jnp.asarray(gt)
    meta = {
        "image_paths": ["a.jpg", "b.jpg"],
        "sampled_classes_list": [["chair"], ["bench"]],
    }
    human_maps = {
        "p2v": batch["human_p2v"], "bary": batch["human_bary"],
        "num_vertices": cfg.num_human_vertices,
    }
    dist = np.abs(
        np.arange(cfg.num_human_vertices)[:, None]
        - np.arange(cfg.num_human_vertices)[None, :]
    ).astype(float)
    _, saved = validate(
        [(batch, meta)], model, params, cfg, "hcontact", MASK,
        human_maps=human_maps, dist_matrix=dist,
    )
    assert len(saved["geo"]) == 2
    assert all(np.isfinite(g) for g in saved["geo"])
    assert saved["geo"][0] != saved["geo"][1]


def test_ocontact_without_gt_warns_not_wrong(tiny):
    """An ocontact batch missing gt_ocontact must warn and skip contact
    F1 -- never silently score against the human GT (VERDICT r2 #4)."""
    import warnings

    cfg, model, params = tiny
    batch = make_batch(cfg, tasks=(4, 4))
    assert "gt_ocontact" not in batch
    meta = {
        "image_paths": ["a.jpg", "b.jpg"],
        "sampled_classes_list": [["cup"], ["cup"]],
    }
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        results, _ = validate(
            [(batch, meta)], model, params, cfg, "ocontact", MASK,
            inference_type="forward",
        )
    assert any("gt_ocontact" in str(x.message) for x in w)


def test_generate_mode_oafford_lifts_per_sample_maps(tiny):
    """Generate-mode eval must lift affordance predictions through the
    PER-SAMPLE pixel->point maps riding the batch (reference loads p2pmap
    npz per sample, components.py:309,318-347). Previously only the demo's
    shared object_maps path lifted, so the eval CLI reported no SIM/AUC."""
    cfg, model, params = tiny
    batch = make_batch(cfg, tasks=(3, 3))  # all oafford
    assert "obj_p2p" in batch, "synthetic oafford batch must carry p2p maps"
    meta = {
        "image_paths": ["a.jpg", "b.jpg"],
        "sampled_classes_list": [["mug"], ["bag"]],
    }
    results, _ = validate(
        [(batch, meta)], model, params, cfg, "oafford", MASK,
    )
    for k in ("sim", "mae", "auc", "aiou"):
        assert k in results and np.isfinite(results[k]), (k, results)
    # the lift actually produced probabilities, not an all-zero fallback
    out = evaluate_batch(model, params, batch, cfg, MASK,
                         contact_type="oafford")
    p3 = out["pred_contact_3d"]
    assert p3 is not None and p3.shape == (2, cfg.num_object_points)
    has = np.asarray(out["has_seg"])
    if has.any():
        assert np.asarray(p3)[has].max() > 0


def test_generate_mode_ocontact_lifts_per_sample_maps(tiny):
    cfg, model, params = tiny
    batch = make_batch(cfg, tasks=(4, 4))  # all ocontact
    if "obj_p2v" not in batch:
        pytest.skip("synthetic batch lacks mesh maps")
    meta = {
        "image_paths": ["a.jpg", "b.jpg"],
        "sampled_classes_list": [["box"], ["box"]],
    }
    results, _ = validate(
        [(batch, meta)], model, params, cfg, "ocontact", MASK,
    )
    for k in ("f1", "precision", "recall"):
        assert k in results and np.isfinite(results[k]), (k, results)


def test_late_seg_token_beyond_32_still_decodes_mask(tiny, monkeypatch):
    """The seg token can be emitted AFTER position 32 of the answer (the
    reference's 'parts' template answers run long, evaluate.py:104 budgets
    512); the gather must pick it up wherever it lands in the generated
    window (VERDICT r04 #3/#4)."""
    from interactvlm_tpu.eval import evaluate as E

    cfg, model, params = tiny
    batch = make_batch(cfg)
    B = np.asarray(batch["input_ids"]).shape[0]
    T, H = 48, cfg.llama.hidden_size
    rng = np.random.default_rng(0)
    gen_ids = np.full((B, T), 7, np.int32)
    gen_ids[:, 40] = cfg.seg_token_idx  # late emission
    canned = {
        "generated_ids": jnp.asarray(gen_ids),
        "step_hidden": jnp.asarray(
            rng.normal(size=(B, T, H)).astype(np.float32)),
        "prompt_hidden": None, "prompt_spliced_ids": None,
        "prompt_len": None,
    }
    monkeypatch.setattr(E, "greedy_generate", lambda *a, **k: canned)
    human_maps = {
        "p2v": batch["human_p2v"], "bary": batch["human_bary"],
        "num_vertices": cfg.num_human_vertices,
    }
    out = E.evaluate_batch(
        model, params, batch, cfg, MASK, contact_type="hcontact",
        max_new_tokens=T, human_maps=human_maps,
    )
    assert out["has_seg"].all()
    assert np.abs(out["pred_masks"]).max() > 0
    # the mask really comes from the hidden state at position 40
    hid = np.asarray(canned["step_hidden"]).copy()
    hid[:, 40] += 1.0
    canned2 = {**canned, "step_hidden": jnp.asarray(hid)}
    monkeypatch.setattr(E, "greedy_generate", lambda *a, **k: canned2)
    out2 = E.evaluate_batch(
        model, params, batch, cfg, MASK, contact_type="hcontact",
        max_new_tokens=T, human_maps=human_maps,
    )
    assert not np.allclose(out["pred_masks"], out2["pred_masks"])


def test_validate_auto_budgets(tiny, monkeypatch):
    """validate() defaults to the reference's 512-token eval budget
    (evaluate.py:104) and auto-sets max_seg_tokens from the model config."""
    from interactvlm_tpu.eval import evaluate as E

    cfg, model, params = tiny
    seen = {}

    def fake_eval_batch(*a, **k):
        seen.update(k)
        B = np.asarray(a[2]["input_ids"]).shape[0]
        V = cfg.multiview_channels
        return {
            "generated_ids": np.zeros((B, 4), np.int32),
            "pred_masks": np.zeros((B, V, MASK, MASK), np.float32),
            "pred_masks_original": None,
            "pred_contact_3d": np.zeros(
                (B, cfg.num_human_vertices), np.float32),
            "has_seg": np.ones(B, bool),
        }

    monkeypatch.setattr(E, "evaluate_batch", fake_eval_batch)
    batch = make_batch(cfg)
    E.validate(iter([(batch, {"image_paths": ["x"] * 2,
                              "sampled_classes_list": [["c"]] * 2})]),
               model, params, cfg, "hcontact", MASK,
               human_maps={"p2v": batch["human_p2v"],
                           "bary": batch["human_bary"]})
    assert seen["max_new_tokens"] == 512
    assert seen["max_seg_tokens"] == 1

    cfg2 = interactvlm_tiny(
        token_type="Gen-Hu-Obj", hseg_token_idx=501, oseg_token_idx=502,
        max_seg_tokens=2,
    )
    E.validate(iter([(batch, {"image_paths": ["x"] * 2,
                              "sampled_classes_list": [["c"]] * 2})]),
               model, params, cfg2, "hcontact", MASK,
               human_maps={"p2v": batch["human_p2v"],
                           "bary": batch["human_bary"]},
               max_new_tokens=64)
    assert seen["max_new_tokens"] == 64
    assert seen["max_seg_tokens"] == 2
