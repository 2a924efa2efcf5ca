"""Host input-pipeline probe (VERDICT r2 #5): measure
data_secs_per_batch at REAL image sizes (B=8, V=4, 1024^2) through the
actual dataset -> collate path, serial vs thread-pool workers.

Generates a throwaway DAMON-like fixture tree at 1024^2 under /tmp on
first run. CPU-only; compares against the measured TPU step time
(~3.5 s/batch at B=8 in round 2) for the <20% criterion.

Usage: python scripts/data_probe.py [workers ...]
Env: PROBE_IMAGES (default 16), PROBE_BATCHES (default 6), PROBE_SIZE
(default 1024).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# host-side pipeline: force the CPU backend BEFORE first use — the
# container sitecustomize pins the axon TPU platform, and the datagen
# rasterizer would otherwise run through the tunnel at ~0.5 s/dispatch
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


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


def build_tree(root: str, size: int, n_images: int):
    from PIL import Image

    from interactvlm_tpu.datagen.recipes import generate_damon_tree
    from interactvlm_tpu.geometry.views import HUMAN_VIEWS

    verts, faces = sphere_mesh()
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    annot = {}
    for i in range(n_images):
        name = f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        ).save(os.path.join(root, "images", name), quality=85)
        start = (i * 23) % (len(verts) - 40)
        annot[name] = {"chair": np.arange(start, start + 30)}
    segm = {"head": list(range(len(verts) // 2)),
            "legs": list(range(len(verts) // 2, len(verts)))}
    generate_damon_tree(
        root, annot, verts, faces, HUMAN_VIEWS["4MV-Z_Vitru_mv2"],
        size, segm,
    )


def main():
    from interactvlm_tpu.runtime.hostmem import tune_host_allocator

    tuned = tune_host_allocator()
    print(f"[data] host allocator tuned: {tuned}", flush=True)
    size = int(os.environ.get("PROBE_SIZE", "1024"))
    n_images = int(os.environ.get("PROBE_IMAGES", "16"))
    n_batches = int(os.environ.get("PROBE_BATCHES", "6"))
    B = int(os.environ.get("PROBE_BATCH", "8"))
    worker_counts = [int(w) for w in sys.argv[1:]] or [1, 4, 8, 16]

    root = os.path.join(
        tempfile.gettempdir(), f"ivlm_data_probe_{size}_{n_images}"
    )
    if not os.path.exists(os.path.join(root, "hcontact_vitruvian_mv2")):
        t0 = time.perf_counter()
        build_tree(root, size, n_images)
        print(f"[data] tree built in {time.perf_counter() - t0:.1f}s "
              f"at {root}", flush=True)

    from interactvlm_tpu.data.collate import collate
    from interactvlm_tpu.data.datasets import HContactDataset
    from interactvlm_tpu.runtime.prefetch import ParallelSampler
    from interactvlm_tpu.utils.testing import WhitespaceTokenizer

    ds = HContactDataset(root, image_size=size, clip_size=224)
    tok = WhitespaceTokenizer()

    for workers in worker_counts:
        sampler = ParallelSampler(
            lambda i: ds[i % len(ds)], num_workers=workers,
            lookahead=max(2 * B, workers),
        )
        it = sampler.iterate(iter(range(10 ** 9)))
        # warm one batch (page cache, pools)
        samples = [next(it) for _ in range(B)]
        collate([samples[0]], tok, max_len=512)
        t0 = time.perf_counter()
        for _ in range(n_batches):
            samples = [next(it) for _ in range(B)]
            collate(samples, tok, max_len=512)
        dt = (time.perf_counter() - t0) / n_batches
        # drain the pool: abandoned lookahead futures would otherwise keep
        # decoding into the NEXT config's timed loop
        sampler.pool.shutdown(wait=True, cancel_futures=True)
        print(f"[data] workers={workers}: {dt:.2f} s/batch "
              f"(B={B}, V=4, {size}px) "
              f"-> {dt / 3.5 * 100:.0f}% of a 3.5s TPU step", flush=True)


if __name__ == "__main__":
    main()
