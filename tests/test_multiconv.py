"""Multi-conversation (offset) semantics tests — VERDICT r2 #3.

The reference samples up to ``num_classes_per_sample=3`` classes per
image (datasets/dataset.py:196,216-246), emitting several conversations
that share one image encode, unpacked per sample via ``offset``
(InteractVLM.py:392-410). The rebuild's static-shape form: B*C
conversation ROWS + compact per-image arrays + an ``image_index``
gather. These tests check (a) collate layout, (b) exact loss parity
between the gathered multi-conv batch and the naively expanded batch
(each conversation with its own repeated image copy).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.config import interactvlm_tiny
from interactvlm_tpu.data.collate import Sample, collate
from interactvlm_tpu.models.interactvlm import InteractVLM
from interactvlm_tpu.utils.testing import WhitespaceTokenizer

from tests.test_data import make_conversation

V, S, Sc, H = 4, 64, 28, 16  # S/Sc match sam_tiny/clip_tiny
NH, NP = 64, 32


def _refer_sample(n_classes=3):
    convs = [
        make_conversation(f"segment thing {i}", "Sure , it is [SEG] .")
        for i in range(n_classes)
    ]
    rng = np.random.default_rng(0)
    return Sample(
        image_path="img0.jpg",
        sam_images=rng.random((1, S, S, 3)).astype(np.float32),
        image_clip=rng.random((Sc, Sc, 3)).astype(np.float32),
        conversations=convs,
        masks=(rng.random((n_classes, H, H)) > 0.5).astype(np.float32),
        label=np.zeros((H, H), np.float32),
        gt_contact_3d=np.zeros(1, np.float32),
        cam_params=np.zeros((1, 5), np.float32),
        resize=(S, S),
        questions=[f"q{i}" for i in range(n_classes)],
        sampled_classes=[f"thing {i}" for i in range(n_classes)],
        ds_name="refer_seg",
        mask_paths=[],
    )


def _contact_sample():
    rng = np.random.default_rng(1)
    return Sample(
        image_path="img1.jpg",
        sam_images=rng.random((V, S, S, 3)).astype(np.float32),
        image_clip=rng.random((Sc, Sc, 3)).astype(np.float32),
        conversations=[
            make_conversation("where is contact", "It is [SEG] .")
        ],
        masks=(rng.random((V, H, H)) > 0.5).astype(np.float32),
        label=np.zeros((H, H), np.float32),
        gt_contact_3d=(rng.random(NH) > 0.8).astype(np.float32),
        cam_params=rng.random((V, 5)).astype(np.float32),
        resize=(S, S),
        questions=["q"],
        sampled_classes=["body"],
        ds_name="hcontact",
        mask_paths=[],
    )


def _collate_mc(samples, tok, C=3):
    return collate(
        samples, tok, max_len=300, multiview_channels=V,
        num_human_vertices=NH, num_object_points=NP,
        num_conversations=C,
    )


class TestCollateMultiConv:
    def test_layout(self):
        tok = WhitespaceTokenizer()
        batch, meta = _collate_mc([_refer_sample(3), _contact_sample()], tok)
        assert batch["input_ids"].shape[0] == 6
        assert list(batch["image_index"]) == [0, 0, 0, 1, 0, 0]
        assert list(batch["task_ids"]) == [1, 1, 1, 2, 0, 0]
        assert batch["images_clip"].shape[0] == 2  # compact
        assert batch["sam_images"].shape == (2, V, S, S, 3)
        assert batch["gt_masks"].shape == (6, V, H, H)
        # pad rows: all-ignore labels + ignore masks
        assert (np.asarray(batch["labels"])[4:] == -100).all()
        assert (np.asarray(batch["gt_masks"])[4:] == -1.0).all()
        # conversation rows carry each class's own mask
        ref = _refer_sample(3)
        for c in range(3):
            assert np.allclose(batch["gt_masks"][c, 0], ref.masks[c])
        assert meta["row_map"][4][2] is True

    def test_single_conv_mode_unchanged(self):
        tok = WhitespaceTokenizer()
        batch, _ = collate(
            [_contact_sample(), _contact_sample()], tok, max_len=300,
            multiview_channels=V, num_human_vertices=NH,
            num_object_points=NP,
        )
        assert "image_index" not in batch
        assert batch["input_ids"].shape[0] == 2


class TestMultiConvModelParity:
    def test_gathered_equals_expanded(self):
        """CE + mask losses of the image-index batch match the naive
        per-conversation image-repeat batch exactly (same math, one
        encode instead of C)."""
        tok = WhitespaceTokenizer()
        ref, con = _refer_sample(3), _contact_sample()
        mc_batch, _ = _collate_mc([ref, con], tok)

        # naive expansion mirroring the row order (incl. 2 pad rows that
        # reuse sample0's image+conv0, exactly like the pad rows do)
        def row_sample(src, ci, ds_name=None):
            return Sample(
                image_path=src.image_path,
                sam_images=src.sam_images,
                image_clip=src.image_clip,
                conversations=[src.conversations[ci]],
                masks=(
                    src.masks[ci][None]
                    if len(src.conversations) > 1 else src.masks
                ),
                label=src.label,
                gt_contact_3d=src.gt_contact_3d,
                cam_params=src.cam_params,
                resize=src.resize,
                questions=[src.questions[ci]],
                sampled_classes=[src.sampled_classes[ci]],
                ds_name=ds_name or src.ds_name,
                mask_paths=[],
            )

        expanded = [
            row_sample(ref, 0), row_sample(ref, 1), row_sample(ref, 2),
            row_sample(con, 0),
            row_sample(ref, 0, "vqa"), row_sample(ref, 0, "vqa"),
        ]
        ex_batch, _ = collate(
            expanded, tok, max_len=300, multiview_channels=V,
            num_human_vertices=NH, num_object_points=NP,
        )
        # mirror the pad-row scrub
        labels = np.asarray(ex_batch["labels"])
        labels[4:] = -100
        ex_batch["labels"] = labels
        ex_batch["gt_masks"] = np.asarray(ex_batch["gt_masks"]).copy()
        ex_batch["gt_masks"][4:] = -1.0

        seg_id = tok.vocab["[SEG]"]
        cfg = interactvlm_tiny(seg_token_idx=seg_id)
        model = InteractVLM(cfg)

        rngk = jax.random.PRNGKey(0)
        params = model.init(rngk, ex_batch)
        out_ex = model.apply(params, ex_batch)
        out_mc = model.apply(params, mc_batch)
        for k in ("ce_loss", "mask_bce_loss", "mask_dice_loss", "loss"):
            a, b = float(out_ex[k]), float(out_mc[k])
            assert abs(a - b) <= 1e-4 * max(1.0, abs(a)), (k, a, b)
        # per-row masks identical
        np.testing.assert_allclose(
            np.asarray(out_ex["pred_masks"]),
            np.asarray(out_mc["pred_masks"]), rtol=2e-4, atol=2e-4,
        )

    def test_multiconv_batch_trains(self):
        """One SGD step on the multi-conv batch decreases its loss."""
        import optax

        tok = WhitespaceTokenizer()
        batch, _ = _collate_mc([_refer_sample(3), _contact_sample()], tok)
        seg_id = tok.vocab["[SEG]"]
        cfg = interactvlm_tiny(seg_token_idx=seg_id)
        model = InteractVLM(cfg)
        params = model.init(jax.random.PRNGKey(0), batch)

        def loss_fn(p):
            return model.apply(p, batch)["loss"]

        l0, g = jax.value_and_grad(loss_fn)(params)
        opt = optax.sgd(1e-2)
        state = opt.init(params)
        upd, _ = opt.update(g, state)
        params2 = optax.apply_updates(params, upd)
        l1 = loss_fn(params2)
        assert float(l1) < float(l0)
