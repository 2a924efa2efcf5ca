"""Full-pipeline learning closed loop (VERDICT r2 #6).

With zero egress there is no way to check accuracy parity against the
reference's released checkpoints; the only available proxy is that the
FULL pipeline -- datagen fixture tree -> real dataset/collate path ->
train loop -> export (LoRA merge) -> generate-mode eval CLI -- actually
LEARNS: contact F1 after training must beat the untrained baseline.
This exercises every layer jointly and catches the bug classes this
architecture invites (frozen-tower autodiff, seg-token plumbing,
lift-map wiring).

Fixture design notes (measured, 2026-08-17 diagnostics):
- The canonical-render setup means every sample shares ONE set of SAM
  view images; the ONLY row-distinguishing decoder input is the
  projected seg-token embedding, so F1 > baseline proves the
  text->[SEG]->prompt-token->decoder pathway carries class information.
- With 4 classes drawn i.i.d. into batches of 8, training stalls at the
  mean-mask solution: the per-pixel batch gradient fluctuates with the
  class composition and Adam's second moment tracks that noise,
  drowning the consistent class-conditional gradient (a fixed batch --
  zero composition variance -- converges in ~120 steps, the i.i.d.
  stream is still flat after 600). TWO classes at batch 8 converge in
  ~250 steps; real-scale training avoids the pathology because
  pretrained towers separate the classes from step 0.
- 'parts' questions (the reference's hC default, train.py:76) put the
  class-correlated body-part words directly before [SEG], so the CE leg
  also pushes the predictor hidden apart per class.
"""

import numpy as np
import pytest

from interactvlm_tpu.datagen.recipes import generate_damon_tree
from interactvlm_tpu.geometry.views import HUMAN_VIEWS

from tests.test_datagen_recipes import put_image, sphere_mesh

S = 64  # sam_tiny img_size


def _make_tree(root, verts, faces):
    n = len(verts)
    # two body parts, two objects, disjoint 60-vertex patches: each
    # class gets a UNIQUE parts answer ("head" vs "legs") and a unique
    # contact mask
    segm = {"head": list(range(0, n // 2)), "legs": list(range(n // 2, n))}
    annot = {}
    for i, obj in enumerate(["chair", "ball"]):
        name = f"img{i}.jpg"
        put_image(root, name)
        annot[name] = {obj: np.arange(i * 100, i * 100 + 60)}
    generate_damon_tree(
        root, annot, verts, faces,
        HUMAN_VIEWS["4MV-Z_Vitru_mv2"], S, segm,
    )


def _run(root, run_root, exp, epochs, steps, lr):
    from interactvlm_tpu.train.train import main as train_main

    return train_main([
        "--tokenizer", "whitespace", "--model_scale", "tiny",
        "--dataset", "hcontact", "--dataset_dir", root,
        "--hC_question_type", "parts", "--fixed_templates",
        "--image_size", str(S), "--clip_size", "28",
        "--num_human_vertices", "178",
        "--model_max_length", "384",
        "--epochs", str(epochs), "--steps_per_epoch", str(steps),
        "--batch_size", "8", "--lr", str(lr), "--warmup_steps", "10",
        "--log_base_dir", run_root, "--exp_name", exp,
        "--val_batches", "2", "--val_every", "4", "--data_workers", "2",
        "--no_tensorboard",
    ])


@pytest.mark.slow
def test_full_pipeline_learns_contact(tmp_path):
    verts, faces = sphere_mesh()
    assert len(verts) == 178
    root = str(tmp_path / "data")
    _make_tree(root, verts, faces)

    runs = str(tmp_path / "runs")
    # baseline: zero-lr "training" = untrained init, same eval path
    _run(root, runs, "base", epochs=1, steps=1, lr=0.0)
    # real training run (2-class fixture converges in ~250 steps)
    _run(root, runs, "trained", epochs=8, steps=40, lr=1e-2)

    from interactvlm_tpu.train.export import main as export_main

    export_main(["--run_dir", f"{runs}/trained",
                 "--out_dir", str(tmp_path / "exported")])
    assert (tmp_path / "exported" / "params").exists()

    from interactvlm_tpu.eval.evaluate import main as eval_main

    def f1_of(run):
        report = eval_main([
            "--run_dir", f"{runs}/{run}", "--dataset_dir", root,
            "--val_dataset", "hcontact", "--batch_size", "4",
            "--max_batches", "2",
        ])
        return report["metrics"]["f1"]

    f1_base = f1_of("base")
    f1_trained = f1_of("trained")
    # a learned class->mask mapping lifts F1 far above the untrained
    # decoder's (which predicts a class-independent mean mask)
    assert f1_trained > f1_base + 0.2, (f1_base, f1_trained)


def _piad_txt(path, cls, pts, sit_mask):
    from interactvlm_tpu.datagen.recipes import AFFORD_LIST_PIAD

    sit_col = int(np.argwhere(AFFORD_LIST_PIAD == "sit").item())
    lines = []
    for i, (p, a) in enumerate(zip(pts, sit_mask)):
        aff = ["0"] * 17
        aff[sit_col] = str(int(a))
        lines.append(
            f"{i} {cls} " + " ".join(f"{v:.4f}" for v in p) + " "
            + " ".join(aff)
        )
    path.write_text("\n".join(lines))


def _make_piad_tree(tmp_path, root):
    from interactvlm_tpu.datagen.recipes import generate_piad_tree
    from interactvlm_tpu.geometry.views import OBJECT_VIEWS

    rng = np.random.default_rng(0)
    # chair: cube-ish cloud, 'sit' on the TOP third; ball: sphere surface,
    # 'sit' on the BOTTOM third -- distinct shapes AND distinct patterns,
    # so the per-sample renders alone carry the class
    cube = rng.uniform(-0.7, 0.7, (300, 3))
    sit_cube = (cube[:, 1] > 0.25).astype(int)
    theta = rng.uniform(0, np.pi, 300)
    phi = rng.uniform(0, 2 * np.pi, 300)
    sphere = np.stack([
        0.7 * np.sin(theta) * np.cos(phi),
        0.7 * np.cos(theta),
        0.7 * np.sin(theta) * np.sin(phi),
    ], axis=1)
    sit_sphere = (sphere[:, 1] < -0.25).astype(int)

    files = {}
    for oid, cls, pts, sit in (
        ("chair_001", "Chair", cube, sit_cube),
        ("ball_001", "Ball", sphere, sit_sphere),
    ):
        txt = tmp_path / f"{oid}.txt"
        _piad_txt(txt, cls, pts, sit)
        files[oid] = str(txt)
        put_image(root, f"{oid}.jpg")
    for split in ("train", "val", "test"):
        generate_piad_tree(
            root, files, OBJECT_VIEWS["4MV-Z_HM"], S, split=split,
            image_for={oid: f"{oid}.jpg" for oid in files},
            object_matches={oid: [oid] for oid in files},
            affordance="sit",
        )


def _run_oafford(root, run_root, exp, epochs, steps, lr):
    from interactvlm_tpu.train.train import main as train_main

    return train_main([
        "--tokenizer", "whitespace", "--model_scale", "tiny",
        "--dataset", "oafford", "--dataset_dir", root,
        "--oC_question_type", "simple", "--fixed_templates",
        "--image_size", str(S), "--clip_size", "28",
        "--num_object_points", "300",
        "--model_max_length", "384",
        "--epochs", str(epochs), "--steps_per_epoch", str(steps),
        "--batch_size", "8", "--lr", str(lr), "--warmup_steps", "10",
        "--log_base_dir", run_root, "--exp_name", exp,
        "--val_batches", "1", "--val_every", "4", "--data_workers", "2",
        "--no_tensorboard",
    ])


@pytest.mark.slow
def test_full_pipeline_learns_affordance(tmp_path):
    """Object-affordance closed loop (the oafford analogue of the hcontact
    loop above): PIAD-style datagen tree -> real dataset/collate (per-sample
    renders + p2p maps) -> train -> generate-mode eval CLI; trained AUC must
    beat the untrained baseline. Unlike hcontact, each class has its own
    renders, so the decoder can separate classes from the image alone."""
    root = str(tmp_path / "data")
    _make_piad_tree(tmp_path, root)

    runs = str(tmp_path / "runs")
    _run_oafford(root, runs, "base", epochs=1, steps=1, lr=0.0)
    _run_oafford(root, runs, "trained", epochs=8, steps=40, lr=1e-2)

    from interactvlm_tpu.eval.evaluate import main as eval_main

    def auc_of(run):
        report = eval_main([
            "--run_dir", f"{runs}/{run}", "--dataset_dir", root,
            "--val_dataset", "oafford", "--batch_size", "4",
            "--max_batches", "2",
        ])
        return report["metrics"]["auc"]

    auc_base = auc_of("base")
    auc_trained = auc_of("trained")
    assert auc_trained > auc_base + 0.1, (auc_base, auc_trained)
    assert auc_trained > 0.6, auc_trained


def _make_vqa_pkl(root):
    import pickle
    from os.path import join

    put_image(root, "vqa0.jpg")
    put_image(root, "vqa1.jpg")
    recs = [
        {"image": "vqa0.jpg", "question": "What is the person doing ?",
         "answer": "sitting on a chair ."},
        {"image": "vqa1.jpg", "question": "What object is being held ?",
         "answer": "a ball ."},
    ]
    with open(join(root, "vqa.pkl"), "wb") as f:
        pickle.dump(recs, f)


def _make_pico_tree(root):
    from interactvlm_tpu.datagen.recipes import generate_pico_tree
    from interactvlm_tpu.geometry.views import OBJECT_VIEWS

    verts, faces = sphere_mesh()
    contact = np.zeros(len(verts), np.float32)
    contact[10:60] = 1.0
    put_image(root, "mug_img.jpg")
    generate_pico_tree(
        root,
        {"mug_009": {"verts": verts, "faces": faces, "contact": contact,
                     "image": "mug_img.jpg", "class_name": "Mug"}},
        OBJECT_VIEWS["4MV-Z_HM_BM"], S,
    )


def _make_piad_tree_bm(tmp_path, root):
    """PIAD tree rendered under the flagship's 4MV-Z_HM_BM views."""
    from interactvlm_tpu.datagen.recipes import generate_piad_tree
    from interactvlm_tpu.geometry.views import OBJECT_VIEWS

    rng = np.random.default_rng(0)
    cube = rng.uniform(-0.7, 0.7, (300, 3))
    sit = (cube[:, 1] > 0.25).astype(int)
    txt = tmp_path / "chair_001.txt"
    _piad_txt(txt, "Chair", cube, sit)
    put_image(root, "chair_001.jpg")
    for split in ("train", "val", "test"):
        generate_piad_tree(
            root, {"chair_001": str(txt)}, OBJECT_VIEWS["4MV-Z_HM_BM"], S,
            split=split, image_for={"chair_001": "chair_001.jpg"},
            object_matches={"chair_001": ["chair_001"]}, affordance="sit",
        )


@pytest.mark.slow
def test_interaction_flagship_preset_end_to_end(tmp_path):
    """The Gen-Hu-Obj interaction flagship (scripts/run_train.sh
    hcontact-ocontact; reference run_train.sh:165-199): the full 4-way
    mixture hcontact||ocontact||oafford||vqa at rates 9,9,5,2 with [HSEG]/
    [OSEG] tokens and vi_v1 cam conditioning trains end-to-end through the
    real datagen -> dataset -> collate -> train-step path, and the trained
    model serves all three contact tasks through the eval CLI."""
    from interactvlm_tpu.train.train import main as train_main

    verts, faces = sphere_mesh()
    root = str(tmp_path / "data")
    _make_tree(root, verts, faces)        # damon hcontact (Vitru views)
    _make_pico_tree(root)                 # pico ocontact
    _make_piad_tree_bm(tmp_path, root)    # piad oafford
    _make_vqa_pkl(root)

    runs = str(tmp_path / "runs")
    # NOTE: hC view type stays the mv2 fixture set (the tree above renders
    # mv2); the reference flagship uses 4MV-Z_Vitru -- same machinery,
    # different camera table.
    train_main([
        "--tokenizer", "whitespace", "--model_scale", "tiny",
        "--dataset", "hcontact||ocontact||oafford||vqa",
        "--sample_rates", "9,9,5,2",
        "--token_type", "Gen-Hu-Obj", "--cam_encoder_type", "vi_v1",
        "--oC_sam_view_type", "4MV-Z_HM_BM",
        "--hC_sam_view_type", "4MV-Z_Vitru_mv2",
        "--hC_question_type", "parts", "--oC_question_type", "afford",
        "--hC_loss_weight", "3.0", "--oC_loss_weight", "3.0",
        "--dataset_dir", root,
        "--image_size", str(S), "--clip_size", "28",
        "--num_human_vertices", "178", "--num_object_points", "300",
        "--model_max_length", "384",
        "--epochs", "1", "--steps_per_epoch", "4",
        "--batch_size", "4", "--lr", "1e-3", "--warmup_steps", "2",
        "--log_base_dir", runs, "--exp_name", "flagship",
        "--val_batches", "1", "--val_every", "1", "--data_workers", "2",
        "--no_tensorboard",
    ])

    from interactvlm_tpu.eval.evaluate import main as eval_main

    r_h = eval_main(["--run_dir", f"{runs}/flagship", "--dataset_dir", root,
                     "--val_dataset", "hcontact", "--batch_size", "2",
                     "--max_batches", "1"])
    assert np.isfinite(r_h["metrics"]["f1"])
    r_oc = eval_main(["--run_dir", f"{runs}/flagship", "--dataset_dir", root,
                      "--val_dataset", "ocontact", "--batch_size", "1",
                      "--max_batches", "1"])
    assert np.isfinite(r_oc["metrics"]["f1"])
    r_oa = eval_main(["--run_dir", f"{runs}/flagship", "--dataset_dir", root,
                      "--val_dataset", "oafford", "--batch_size", "1",
                      "--max_batches", "1"])
    assert np.isfinite(r_oa["metrics"]["auc"])
