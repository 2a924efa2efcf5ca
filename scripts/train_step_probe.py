"""Real-shape train-step timing on ONE TPU chip (VERDICT r3 #7).

The reference trains LISA-13B with DeepSpeed ZeRO-2 at bs 8/GPU
(/root/reference/train.py:254,356-389; run_train.sh:15). This probe times
OUR pjit train step (train/train_step.py) at reference shapes -- LoRA r=8
on q/v, frozen towers, 4 views of 1024px SAM input, 512 spliced tokens,
1024^2 GT masks, full focal+dice+3D-lift losses -- on whatever fits one
v5e chip, so the utils/memory.py training budget table carries at least
one measured point.

Per the budget table (README), 7B bf16 LoRA fits a single chip only at
B<=2; B=8 rides grad-accum (the reference's own mechanism, train.py:518).

  PROBE_LLAMA=7b PROBE_B=2 PROBE_ACCUM=4 python scripts/train_step_probe.py

prints one JSON line: ms/step (median of PROBE_REPEATS kept windows after
an explicit discard-first warmup window -- r04's artifact let a 55.8 s
axon-tunnel stall into the committed spread), images/sec, tokens/sec,
an analytic train-MFU, and the per-chip budget prediction next to the
measurement. PROBE_OUT=path writes the JSON artifact;
``BENCH_MODE=train python bench.py`` drives this probe so the number is
driver-regenerable.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(*a):
    print("[probe]", *a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from interactvlm_tpu import config as cfgs
    from interactvlm_tpu.models.interactvlm import InteractVLM
    from interactvlm_tpu.runtime.hostmem import tune_host_allocator
    from interactvlm_tpu.train.optimizer import make_optimizer, trainable_mask
    from interactvlm_tpu.train.train_step import (
        create_sharded_state,
        make_train_step,
    )
    from interactvlm_tpu.utils.memory import training_budget
    from interactvlm_tpu.utils.testing import make_synthetic_batch

    tune_host_allocator()
    size = os.environ.get("PROBE_LLAMA", "7b")
    B = int(os.environ.get("PROBE_B", "2"))
    accum = int(os.environ.get("PROBE_ACCUM", "1"))
    V = int(os.environ.get("PROBE_VIEWS", "4"))
    L_TEXT = int(os.environ.get("PROBE_TEXT", "257"))  # spliced: +255 = 512
    mask_size = int(os.environ.get("PROBE_MASK", "1024"))
    on_tpu = jax.devices()[0].platform != "cpu"
    repeats = int(os.environ.get("PROBE_REPEATS", "5" if on_tpu else "3"))
    steps_per_window = int(os.environ.get(
        "PROBE_STEPS", "32" if on_tpu else "2"))

    int8_base = os.environ.get("PROBE_INT8", "0") == "1"
    # PROBE_SAM_INT8=1: store the FROZEN SAM encoder in the serving int8
    # layout (Int8Dense + tanh GELU, parity-tested <=3e-3 activation
    # deviation, tests/test_sam.py). QLoRA already quantizes the frozen
    # LLaMA base; the frozen vision tower is the same move, and the
    # encoder is forward-only under stop_gradient so no gradient path
    # changes -- only the encode leg's wall time and weight HBM.
    sam_int8 = os.environ.get("PROBE_SAM_INT8", "0") == "1"
    if size == "tiny":  # CPU smoke of this probe itself
        dtype = jnp.float32
        cfg = cfgs.interactvlm_tiny(
            llama=cfgs.llama_tiny(lora_rank=4, weights_int8=int8_base),
            sam=cfgs.sam_tiny(weights_int8=sam_int8),
        )
        lcfg = cfg.llama
    else:
        dtype = jnp.bfloat16
        lc = {"7b": cfgs.llama_7b, "13b": cfgs.llama_13b}[size]
        # PROBE_INT8=1: QLoRA mode -- frozen int8 base + bf16 adapters
        # (the only 7B configuration that fits one 16 GB chip; bf16-base
        # LoRA training needs TP-2, see utils/memory.training_budget)
        lcfg = lc(dtype=dtype, lora_rank=8, lora_alpha=16,
                  weights_int8=int8_base)
        cfg = cfgs.InteractVLMConfig(
            llama=lcfg,
            clip=cfgs.clip_vit_l_14(dtype=dtype),
            sam=cfgs.sam_vit_h(dtype=dtype, weights_int8=sam_int8,
                               gelu_approx=sam_int8 and on_tpu),
            seg_token_idx=min(lcfg.vocab_size - 1, 32000),
            img_emb_len=cfgs.clip_vit_l_14().num_patches - 1,
            multiview_channels=V,
            out_dim=256,
        )
    bud = training_budget(cfg, batch=B, views=V, seq_len=L_TEXT + 255)
    log(f"{size} LoRA B={B} accum={accum} seq={L_TEXT + 255} "
        f"budget={bud.total / 2**30:.2f} GiB fits={bud.fits()}")

    model = InteractVLM(cfg)
    micro = make_synthetic_batch(cfg, B=B, L=L_TEXT, tasks=(2,),
                                 mask_size=mask_size)
    batch = micro
    if accum > 1:
        batch = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (accum,) + x.shape), micro
        )

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                ("data", "model"))
    # The real trainer's masked optimizer (train/train.py:439-441): Adam
    # moments exist ONLY for trainables (LoRA + heads, ~0.1% of 7B) --
    # an unmasked adamw would allocate 54 GB of f32 moments and OOM.
    tx, _ = make_optimizer(3e-4, weight_decay=0.0, mask=trainable_mask)
    t0 = time.perf_counter()
    with mesh:
        state, shardings = create_sharded_state(
            model, tx, micro, mesh, frozen_dtype=dtype
        )
        log(f"state init {time.perf_counter() - t0:.1f}s")
        step_fn = make_train_step(model, tx, mesh, shardings,
                                  batch, accum_steps=accum)

        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        loss = float(np.asarray(jax.device_get(metrics["loss"])))
        log(f"compile+step0 {time.perf_counter() - t0:.1f}s loss={loss:.4f}")
        assert np.isfinite(loss)

        times = []
        for w in range(repeats + 1):  # +1: discard-first warmup window
            t0 = time.perf_counter()
            for _ in range(steps_per_window):
                state, metrics = step_fn(state, batch)
            loss = float(np.asarray(jax.device_get(metrics["loss"])))
            assert np.isfinite(loss)
            dt = (time.perf_counter() - t0) / steps_per_window
            log(f"window {w}: {dt * 1e3:.1f} ms/step"
                + (" (discarded warmup)" if w == 0 else ""))
            if w > 0:
                times.append(dt)

    ms = float(np.median(times)) * 1e3
    eff_b = B * accum

    # ---- PROBE_LEGS=1: attribute the step (VERDICT r04 "train-step
    # measurement is thin"). Three jitted legs, each a fori_loop with a
    # data dependence (the axon tunnel's block_until_ready does not
    # block; a loop-carried scalar forces real execution):
    #   sam_encode_fwd -- the frozen encoder forward at B*V views;
    #   loss_fwd       -- the full train-loss forward (no backward);
    # backward+update = full step - loss_fwd; llama+tail fwd =
    # loss_fwd - sam_encode_fwd.
    legs = None
    if os.environ.get("PROBE_LEGS", "0") == "1":
        from interactvlm_tpu.models.interactvlm import InteractVLM as IV

        leg_steps = int(os.environ.get(
            "PROBE_LEG_STEPS", "8" if on_tpu else "2"))

        def timed(label, loop_fn, *args):
            fn = jax.jit(loop_fn)
            t0 = time.perf_counter()
            s = float(np.asarray(jax.device_get(fn(*args))))
            log(f"leg {label} compile {time.perf_counter() - t0:.1f}s")
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                s = float(np.asarray(jax.device_get(fn(*args))))
                assert np.isfinite(s), label
                ts.append((time.perf_counter() - t0) / leg_steps)
            med = float(np.median(ts)) * 1e3
            log(f"leg {label}: {med:.1f} ms "
                f"[{min(ts) * 1e3:.1f}-{max(ts) * 1e3:.1f}]")
            return round(med, 1)

        imgs = micro["sam_images"]

        def sam_loop(p, im):
            def body(i, c):
                emb = model.apply(
                    p, im + (0.0 * c).astype(im.dtype),
                    method=IV.encode_sam_images,
                )
                return c + emb.mean().astype(jnp.float32)

            return jax.lax.fori_loop(0, leg_steps, body, jnp.float32(0.0))

        def fwd_loop(p, b):
            def body(i, c):
                b2 = dict(b)
                b2["sam_images"] = b["sam_images"] + (0.0 * c).astype(
                    b["sam_images"].dtype
                )
                out = model.apply(p, b2)
                return c + out["loss"].astype(jnp.float32)

            return jax.lax.fori_loop(0, leg_steps, body, jnp.float32(0.0))

        with mesh:
            sam_ms = timed("sam_encode_fwd", sam_loop, state.params, imgs)
            fwd_ms = timed("loss_fwd", fwd_loop, state.params, micro)
        legs = {
            "sam_encode_fwd_ms": sam_ms,
            "loss_fwd_ms": fwd_ms,
            "llama_tail_fwd_ms": round(fwd_ms - sam_ms, 1),
            "bwd_update_ms": round(ms / accum - fwd_ms, 1),
            "leg_steps": leg_steps,
        }
        log(f"legs: {legs}")

    # analytic train-MFU: SAM encoder runs forward-only (frozen +
    # stop_gradient, models/interactvlm.py:encode_sam_images); the LLaMA
    # base and CLIP are frozen so their backward is activation-grads only
    # (one dx matmul per forward matmul, no dW) => ~2x forward; LoRA /
    # decoder-head dW terms are <1% and ride the 2% pad.
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import (V5E_BF16_PEAK_FLOPS, _flops_per_image,
                       _llama_matmul_params)

    Lp = L_TEXT + 255
    p_l = _llama_matmul_params(lcfg)
    f_llama = 2 * p_l * Lp
    f_total = _flops_per_image(cfg, V, Lp, 0, mask_size)  # fwd, all legs
    f_sam_clip = f_total / 1.02 - f_llama  # forward-only legs
    f_train = 1.02 * (f_sam_clip + 2 * f_llama) * eff_b
    train_mfu = (f_train / (ms / 1e3) / V5E_BF16_PEAK_FLOPS
                 if size != "tiny" else 0.0)
    tokens_per_sec = eff_b * Lp / (ms / 1e3)
    print(json.dumps({
        "metric": f"train_step_ms_llama{size}"
                  f"{'-int8base' if int8_base else ''}"
                  f"{'-samint8' if sam_int8 else ''}_lora{lcfg.lora_rank}_"
                  f"b{B}x{accum}_{V}view_seq{L_TEXT + 255}_mask{mask_size}",
        "value": round(ms, 1),
        "unit": "ms/step",
        "spread_ms": [round(min(times) * 1e3, 1),
                      round(max(times) * 1e3, 1)],
        "images_per_sec": round(eff_b / (ms / 1e3), 3),
        "budget_gib": round(bud.total / 2**30, 2),
        "budget_fits": bud.fits(),
        "final_loss": round(loss, 4),
        "steps_per_window": steps_per_window,
        "n_windows": repeats,
        "batch_size": B,
        "seq_len": Lp,
        "tokens_per_sec": round(tokens_per_sec, 1),
        "train_mfu": round(train_mfu, 4),
        **({"legs": legs} if legs else {}),
    }, ))
    if os.environ.get("PROBE_OUT"):
        with open(os.environ["PROBE_OUT"], "w") as f:
            json.dump({
                "metric": f"train_step_ms_llama{size}"
                          f"{'-int8base' if int8_base else ''}"
                          f"{'-samint8' if sam_int8 else ''}_"
                          f"lora{lcfg.lora_rank}_b{B}x{accum}_{V}view_"
                          f"seq{Lp}_mask{mask_size}",
                "value": round(ms, 1), "unit": "ms/step",
                "spread_ms": [round(min(times) * 1e3, 1),
                              round(max(times) * 1e3, 1)],
                "images_per_sec": round(eff_b / (ms / 1e3), 3),
                "tokens_per_sec": round(tokens_per_sec, 1),
                "train_mfu": round(train_mfu, 4),
                "steps_per_window": steps_per_window,
                "n_windows": repeats,
                "batch_size": B, "seq_len": Lp,
                "budget_gib": round(bud.total / 2**30, 2),
                "budget_fits": bud.fits(),
                "final_loss": round(loss, 4),
                **({"legs": legs} if legs else {}),
            }, f, indent=2)


if __name__ == "__main__":
    main()
