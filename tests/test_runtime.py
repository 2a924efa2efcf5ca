"""Runtime tests: native C++ decoder parity vs PIL, fused preprocess parity
vs the python transforms, prefetch iterator semantics, train CLI smoke."""

import os

import numpy as np
import pytest
from PIL import Image

from interactvlm_tpu.runtime import native_image
from interactvlm_tpu.runtime.prefetch import ParallelSampler, PrefetchIterator


@pytest.fixture(scope="module")
def image_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
    png = str(d / "a.png")
    jpg = str(d / "b.jpg")
    Image.fromarray(arr).save(png)
    Image.fromarray(arr).save(jpg, quality=95)
    gray = str(d / "g.png")
    Image.fromarray(arr[..., 0]).save(gray)
    return arr, png, jpg, gray


class TestNativeDecoder:
    def test_builds(self):
        assert native_image.available(), "native decoder failed to build"

    def test_png_parity_with_pil(self, image_files):
        arr, png, jpg, gray = image_files
        got = native_image.decode_rgb(png)
        assert got.shape == arr.shape
        assert np.array_equal(got, arr)

    def test_jpeg_decodes_close(self, image_files):
        arr, png, jpg, gray = image_files
        got = native_image.decode_rgb(jpg)
        pil = np.asarray(Image.open(jpg).convert("RGB"))
        assert got.shape == pil.shape
        assert np.abs(got.astype(int) - pil.astype(int)).mean() < 3

    def test_gray_png_to_rgb(self, image_files):
        arr, png, jpg, gray = image_files
        got = native_image.decode_rgb(gray)
        assert got.shape == (37, 53, 3)
        assert np.array_equal(got[..., 0], got[..., 1])

    def test_fused_preprocess_matches_python(self, image_files):
        arr, png, jpg, gray = image_files
        from interactvlm_tpu.data.transforms import sam_preprocess

        native, (nh, nw) = native_image.sam_preprocess_native(png, 64)
        ref, (rh, rw) = sam_preprocess(arr, 64)
        assert (nh, nw) == (rh, rw)
        assert np.abs(native - ref).max() < 1e-2

    def test_missing_file_clean_error(self):
        with pytest.raises(IOError):
            native_image.decode_rgb("/nonexistent/file.png")


class TestPrefetch:
    def test_prefetch_order_and_exhaustion(self):
        it = PrefetchIterator(iter(range(10)), depth=3)
        assert list(it) == list(range(10))

    def test_prefetch_propagates_errors(self):
        def gen():
            yield 1
            raise ValueError("boom")

        it = PrefetchIterator(gen())
        assert next(it) == 1
        with pytest.raises(ValueError):
            next(it)

    def test_parallel_sampler_order(self):
        sampler = ParallelSampler(lambda i: i * i, num_workers=3)
        out = list(sampler.iterate(range(20)))
        assert out == [i * i for i in range(20)]


@pytest.mark.slow
def test_train_cli_synthetic_smoke(tmp_path):
    from interactvlm_tpu.train.train import main

    state = main([
        "--synthetic", "--epochs", "2", "--steps_per_epoch", "3",
        "--batch_size", "2",
        "--log_base_dir", str(tmp_path), "--exp_name", "smoke",
        "--n_model_shards", "2",
    ])
    assert int(state.step) == 6
    run = tmp_path / "smoke"
    assert (run / "config.json").exists()
    assert (run / "pretrained_config.json").exists()
    assert (run / "ckpt").exists()
    assert (run / "ckpt_best").exists()


@pytest.mark.slow
def test_train_cli_resume(tmp_path):
    from interactvlm_tpu.train.train import main

    main([
        "--synthetic", "--epochs", "1", "--steps_per_epoch", "2",
        "--batch_size", "2", "--log_base_dir", str(tmp_path),
        "--exp_name", "r", "--no_eval",
    ])
    state = main([
        "--synthetic", "--epochs", "2", "--steps_per_epoch", "2",
        "--batch_size", "2", "--log_base_dir", str(tmp_path),
        "--exp_name", "r", "--resume", "--no_eval",
    ])
    assert int(state.step) == 4


@pytest.mark.slow
def test_train_export_eval_chain(tmp_path):
    """Full lifecycle: train -> export (LoRA merge) -> eval CLI."""
    from interactvlm_tpu.train.train import main as train_main

    train_main([
        "--synthetic", "--epochs", "1", "--steps_per_epoch", "2",
        "--batch_size", "2", "--log_base_dir", str(tmp_path),
        "--exp_name", "chain",
    ])
    run_dir = str(tmp_path / "chain")

    from interactvlm_tpu.train.export import main as export_main

    export_main(["--run_dir", run_dir, "--out_dir", str(tmp_path / "exp")])
    assert (tmp_path / "exp" / "params").exists()

    from interactvlm_tpu.eval.evaluate import main as eval_main

    report = eval_main([
        "--run_dir", run_dir, "--synthetic", "--max_batches", "1",
        "--val_dataset", "hcontact",
    ])
    assert "metrics" in report and "f1" in report["metrics"]
    assert "damon_binary" in report


def test_hybrid_pick_thread_safe():
    """HybridDataset.pick serializes rng draws so ParallelSampler threads
    can fetch samples concurrently (VERDICT r2 #5)."""
    from concurrent.futures import ThreadPoolExecutor

    from interactvlm_tpu.data.datasets import HybridDataset

    class _FakeDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            assert 0 <= i < self.n
            return i

    hybrid = HybridDataset([_FakeDS(10), _FakeDS(100)], [1.0, 3.0],
                           samples_per_epoch=64)
    with ThreadPoolExecutor(max_workers=8) as pool:
        out = list(pool.map(lambda i: hybrid[i], range(512)))
    assert len(out) == 512
    assert all(isinstance(x, int) for x in out)
