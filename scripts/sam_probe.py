"""SAM encoder perf probe: time ViT-H 1024px encode variants on the real
chip to localize MFU loss (windows vs global vs rel-pos bias vs neck).

Usage: python scripts/sam_probe.py [variant ...]
Variants: full, norel (rel-pos bias disabled), noattn (attention replaced
by identity: isolates the matmul legs). Default: full norel.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    import dataclasses

    from interactvlm_tpu.config import sam_vit_h
    from interactvlm_tpu.models.sam.image_encoder import ImageEncoderViT

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B = int(os.environ.get("PROBE_BATCH", "8"))
    S = int(os.environ.get("PROBE_SIZE", "1024" if on_tpu else "256"))
    iters = int(os.environ.get("PROBE_ITERS", "3"))
    variants = sys.argv[1:] or ["full", "norel"]

    base = sam_vit_h(dtype=dtype)
    if S != base.img_size:
        base = dataclasses.replace(base, img_size=S)

    e, depth = base.encoder_embed_dim, base.encoder_depth
    tokens = (S // base.patch_size) ** 2
    p_s = depth * (4 * e * e + 2 * e * int(e * base.mlp_ratio))
    n_global = len(base.encoder_global_attn_indexes)
    f_attn = (
        n_global * 4 * tokens * tokens * e
        + (depth - n_global) * 4 * tokens * base.window_size ** 2 * e
    )
    flops = B * (2 * p_s * tokens + f_attn)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, S, 3), dtype)

    import functools

    from interactvlm_tpu.models.sam import image_encoder as ie_mod

    orig_attention = ie_mod.Attention
    orig_mlp = ie_mod.MLPBlock

    for name in variants:
        cfg = base
        ie_mod.MLPBlock = orig_mlp
        if name == "int8":
            # serving int8 config exactly as BENCH_SAM_WQ=int8 builds it
            # (fused Pallas quantize+matmul+GELU, tanh epilogue)
            cfg = dataclasses.replace(
                base, weights_int8=True, gelu_approx=True
            )
        elif name == "int8erf":
            cfg = dataclasses.replace(base, weights_int8=True)
        elif name == "noattn8":
            # int8 matmuls + identity attention: isolates the matmul leg
            # of the int8 composition (B=32 e2e int8 gain collapse)
            cfg = dataclasses.replace(
                base, weights_int8=True, gelu_approx=True
            )
        elif name == "noattn":
            # tanh GELU so noattn vs noattn8 differ ONLY in int8
            cfg = dataclasses.replace(base, gelu_approx=True)
        if name == "gelutanh":
            import flax.linen as nn

            class _TanhMLP(nn.Module):
                mlp_dim: int
                out_dim: int
                dtype: jnp.dtype = jnp.float32
                gelu_approx: bool = True  # Block passes it; always tanh

                @nn.compact
                def __call__(self, x):
                    x = nn.Dense(self.mlp_dim, dtype=self.dtype,
                                 name="lin1")(x)
                    x = nn.gelu(x, approximate=True)
                    return nn.Dense(self.out_dim, dtype=self.dtype,
                                    name="lin2")(x)

            ie_mod.MLPBlock = _TanhMLP
        if name == "norel":
            ie_mod.Attention = functools.partial(
                orig_attention, use_rel_pos=False
            )
        elif name in ("noattn", "noattn8"):
            import flax.linen as nn

            from interactvlm_tpu.models.sam.image_encoder import _enc_dense

            _i8 = name == "noattn8"

            class _IdAttn(nn.Module):
                dim: int
                num_heads: int
                input_size: tuple = None
                dtype: jnp.dtype = jnp.float32

                @nn.compact
                def __call__(self, x):
                    x = _enc_dense(self.dim * 3, "qkv", self.dtype,
                                   int8=_i8)(x)[..., : self.dim]
                    return _enc_dense(self.dim, "proj", self.dtype,
                                      int8=_i8)(x)

            ie_mod.Attention = _IdAttn
        else:
            ie_mod.Attention = orig_attention
        enc = ImageEncoderViT(cfg)
        params = jax.jit(enc.init)(key, x[:1])
        if on_tpu:
            from interactvlm_tpu.utils.weights import cast_serving_params

            params = jax.jit(
                lambda p: cast_serving_params(p, dtype)
            )(params)

        def run(params, x):
            def body(i, acc):
                out = enc.apply(params, x + acc * 1e-6)
                return out.mean().astype(jnp.float32)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        fn = jax.jit(run)
        t0 = time.perf_counter()
        out = fn(params, x)
        float(np.asarray(jax.device_get(out)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = fn(params, x)
        float(np.asarray(jax.device_get(out)))
        dt = (time.perf_counter() - t0) / iters
        mfu = flops / dt / 197e12 if on_tpu else 0.0
        print(
            f"[probe] {name}: {dt * 1e3:.1f} ms/encode-batch(B={B}) "
            f"{B / dt:.2f} views/s mfu={mfu:.3f} (compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
