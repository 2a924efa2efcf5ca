"""Metric tests: hand-computed golden values + AUC cross-check."""

import numpy as np
import pytest

from interactvlm_tpu.eval.metrics import (
    affordance_metrics,
    auc_score,
    contact_f1,
    geodesic_contact_errors,
    intersection_and_union,
    segmentation_metrics,
    similarity,
)
from interactvlm_tpu.utils.constants import (
    add_new_tokens,
    seg_token_strings,
    substitute_seg_tokens,
)
from interactvlm_tpu.utils.meters import AverageMeter


def test_intersection_union_with_ignore():
    pred = np.array([1, 1, 0, 0, 1])
    gt = np.array([1, 0, 0, -1, 1])
    inter, union, tgt = intersection_and_union(pred, gt, 2)
    # ignore pixel dropped; classes {0:1 correct of (pred 1, gt 2)},
    # {1: 2 correct of (pred 3, gt 2)}
    assert inter[0] == 1 and inter[1] == 2
    assert union[1] == 3  # pred 3 + gt 2 - inter 2


def test_contact_f1_perfect_and_empty():
    gt = np.zeros((2, 10))
    gt[0, :5] = 1
    pred = gt.copy()
    f1, p, r = contact_f1(gt, pred)
    # sample 0 perfect; sample 1 has no positives -> 0 contributions
    assert f1 == pytest.approx(0.5, abs=1e-6)
    gt2 = np.ones((1, 4))
    pred2 = np.array([[1.0, 1.0, 0.0, 0.0]])
    f1, p, r = contact_f1(gt2, pred2)
    assert p == pytest.approx(1.0, abs=1e-6)
    assert r == pytest.approx(0.5, abs=1e-6)
    assert f1 == pytest.approx(2 / 3, abs=1e-4)


def test_geodesic_errors_zero_for_exact():
    N = 6
    d = np.abs(np.arange(N)[:, None] - np.arange(N)[None, :]).astype(float)
    gt = np.zeros((1, N))
    gt[0, 2] = 1
    pred = gt.copy()
    fp, fn = geodesic_contact_errors(pred, gt, d)
    assert fp == 0.0 and fn == 0.0
    # predict vertex 4 instead of 2 -> distance 2
    pred2 = np.zeros((1, N))
    pred2[0, 4] = 1
    fp, fn = geodesic_contact_errors(pred2, gt, d)
    assert fp == 2.0 and fn == 2.0


def test_auc_matches_sklearn_if_available():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 200)
    scores = rng.normal(size=200) + labels * 0.7
    got = auc_score(labels, scores)
    try:
        from sklearn.metrics import roc_auc_score
    except ImportError:
        assert 0.5 < got < 1.0
        return
    assert got == pytest.approx(roc_auc_score(labels, scores), abs=1e-9)
    # with ties
    scores_t = np.round(scores, 1)
    assert auc_score(labels, scores_t) == pytest.approx(
        roc_auc_score(labels, scores_t), abs=1e-9
    )


def test_affordance_metrics_golden():
    gt = np.zeros((1, 8))
    gt[0, :4] = 1.0
    pred = gt.copy()
    sim, mae, auc, aiou, valid = affordance_metrics(gt, pred, num_points=8)
    assert sim == pytest.approx(1.0, abs=1e-6)
    assert mae == 0.0
    assert auc == pytest.approx(1.0)
    assert valid == 1
    # single-class GT excluded from auc/aiou
    gt0 = np.zeros((1, 8))
    sim, mae, auc, aiou, valid = affordance_metrics(gt0, gt0, num_points=8)
    assert valid == 0


def test_segmentation_metrics_shapes():
    pred = np.zeros((2, 4, 4))
    pred[:, :2] = 5.0  # logits > 0
    gt = np.zeros((2, 4, 4))
    gt[:, :2] = 1
    inter, union, acc = segmentation_metrics(pred, gt)
    assert acc[1] == pytest.approx(1.0, abs=1e-4)


def test_similarity():
    a = np.array([1.0, 0.0])
    b = np.array([0.0, 1.0])
    assert similarity(a, b) == pytest.approx(0.0, abs=1e-9)
    assert similarity(a, a) == pytest.approx(1.0, abs=1e-9)


def test_seg_token_registry():
    assert seg_token_strings("Gen") == ("[SEG]", "[SEG]", "[SEG]")
    assert seg_token_strings("Gen-Hu-Obj") == ("[SEG]", "[HSEG]", "[OSEG]")
    assert seg_token_strings("Gen-Int-DifDe") == ("[SEG]", "[ISEG]", "[ISEG]")
    s = substitute_seg_tokens("x [HTOKEN] y [OTOKEN]", "Gen-Hu-Obj")
    assert s == "x [HSEG] y [OSEG]"


def test_add_new_tokens_with_hf_tokenizer():
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained("gpt2")
    except Exception:
        pytest.skip("no local tokenizer available")
    tok, seg, hseg, oseg = add_new_tokens(tok, "Gen-Hu-Obj")
    assert seg != hseg != oseg
    assert tok.convert_ids_to_tokens(seg) == "[SEG]"


def test_average_meter_skips_nan():
    m = AverageMeter("x")
    m.update(1.0)
    m.update(float("nan"))
    m.update(3.0)
    assert m.count == 2
    assert float(m.avg) == pytest.approx(2.0)
