"""LLaVA stack tests: splice semantics, CE masking, KV-cache decode parity
with the full forward pass, greedy generate."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from interactvlm_tpu.config import clip_tiny, llama_tiny
from interactvlm_tpu.models.llama import (
    LlamaForCausalLM,
    cross_entropy_loss,
    init_kv_cache,
)
from interactvlm_tpu.models.llava import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    PATCH_ID,
    LlavaModel,
    seg_predictor_mask,
    splice_indices,
    splice_scalar,
)
from interactvlm_tpu.models.generate import greedy_generate


@pytest.fixture(scope="module")
def tiny_llava():
    lcfg = llama_tiny()
    ccfg = clip_tiny()
    model = LlavaModel(lcfg, ccfg)
    key = jax.random.PRNGKey(0)
    ids = make_prompt(2, 10)
    pixels = jax.random.normal(key, (2, ccfg.image_size, ccfg.image_size, 3))
    params = model.init(key, ids, pixels)
    return lcfg, ccfg, model, params


def make_prompt(B, L, img_at=3):
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 500, size=(B, L)).astype(np.int32)
    ids[:, img_at] = IMAGE_TOKEN_INDEX
    return jnp.asarray(ids)


class TestSplice:
    def test_indices_semantics(self):
        ids = make_prompt(1, 6, img_at=2)
        idx, is_patch, img_pos, has_img = splice_indices(ids, num_patches=4)
        assert bool(has_img[0])
        assert int(img_pos[0]) == 2
        # Lout = 6 - 1 + 4 = 9; layout: t0 t1 p0 p1 p2 p3 t3 t4 t5
        want_patch = [False, False, True, True, True, True, False, False, False]
        assert list(np.asarray(is_patch[0])) == want_patch
        spliced = splice_scalar(ids, idx, is_patch, PATCH_ID)
        got = list(np.asarray(spliced[0]))
        ids_np = np.asarray(ids[0])
        want = [ids_np[0], ids_np[1], PATCH_ID, PATCH_ID, PATCH_ID, PATCH_ID,
                ids_np[3], ids_np[4], ids_np[5]]
        assert got == [int(w) for w in want]

    def test_no_image_row(self):
        ids = jnp.asarray(
            np.random.default_rng(0).integers(4, 500, (1, 6)).astype(np.int32)
        )
        idx, is_patch, img_pos, has_img = splice_indices(ids, 4)
        assert int(img_pos[0]) == 6  # sentinel: past the end
        assert not bool(has_img[0])
        # dummy-patch tail positions exist but get attention mask 0

    def test_seg_predictor_mask(self):
        spliced = jnp.asarray([[5, 7, PATCH_ID, PATCH_ID, 9, 42, 9]])
        mask = seg_predictor_mask(spliced, [42])
        # token 42 at index 5 -> predictor position 4 marked
        assert list(np.asarray(mask[0]).astype(int)) == [0, 0, 0, 0, 1, 0, 0]


class TestLlama:
    def test_ce_loss_ignores_masked(self):
        logits = jnp.zeros((1, 4, 8))
        labels = jnp.asarray([[IGNORE_INDEX, 1, IGNORE_INDEX, 2]])
        loss = cross_entropy_loss(logits, labels)
        assert np.isclose(float(loss), np.log(8), atol=1e-5)

    def test_kv_cache_matches_full_forward(self):
        """Prefill + stepwise decode must reproduce the full-sequence
        forward logits exactly (the core decode-correctness invariant)."""
        cfg = llama_tiny()
        model = LlamaForCausalLM(cfg)
        key = jax.random.PRNGKey(1)
        ids = jax.random.randint(key, (2, 9), 0, cfg.vocab_size)
        params = model.init(key, ids)

        full_logits, _ = model.apply(params, ids)

        # prefill first 5, decode 4 more
        def fwd_embeds(p, e, pos, caches):
            return model.apply(
                p, e, pos, None, caches, method=LlamaForCausalLM.forward_embeds
            )

        emb = model.apply(params, ids[:, :5], method=LlamaForCausalLM.embed)
        caches = init_kv_cache(cfg, 2, 9)
        pos = jnp.broadcast_to(jnp.arange(5)[None], (2, 5))
        lg, _, caches = fwd_embeds(params, emb, pos, caches)
        assert np.allclose(
            np.asarray(lg), np.asarray(full_logits[:, :5]), atol=2e-4
        )
        for t in range(5, 9):
            emb = model.apply(
                params, ids[:, t : t + 1], method=LlamaForCausalLM.embed
            )
            pos = jnp.full((2, 1), t)
            lg, _, caches = fwd_embeds(params, emb, pos, caches)
            assert np.allclose(
                np.asarray(lg[:, 0]), np.asarray(full_logits[:, t]), atol=2e-4
            ), f"step {t} mismatch"


class TestLlavaForward:
    def test_forward_shapes(self, tiny_llava):
        lcfg, ccfg, model, params = tiny_llava
        ids = make_prompt(2, 10)
        pixels = jnp.zeros((2, ccfg.image_size, ccfg.image_size, 3))
        labels = jnp.where(ids == IMAGE_TOKEN_INDEX, IGNORE_INDEX, ids)
        out = model.apply(params, ids, pixels, labels)
        Lout = 10 - 1 + ccfg.num_patches
        assert out.logits.shape == (2, Lout, lcfg.vocab_size)
        assert out.hidden.shape == (2, Lout, lcfg.hidden_size)
        assert out.spliced_labels.shape == (2, Lout)
        # patch positions carry IGNORE
        patch_pos = np.asarray(out.spliced_ids) == PATCH_ID
        assert (np.asarray(out.spliced_labels)[patch_pos] == IGNORE_INDEX).all()

    def test_vision_tower_frozen(self, tiny_llava):
        lcfg, ccfg, model, params = tiny_llava
        ids = make_prompt(1, 8)
        pixels = jnp.ones((1, ccfg.image_size, ccfg.image_size, 3))

        def loss(p):
            out = model.apply(p, ids, pixels)
            return (out.logits.astype(jnp.float32) ** 2).mean()

        g = jax.grad(loss)(params)
        tower_g = jax.tree.leaves(g["params"]["vision_tower"])
        assert all(float(jnp.abs(t).max()) == 0 for t in tower_g)
        proj_g = jax.tree.leaves(g["params"]["mm_projector"])
        assert any(float(jnp.abs(t).max()) > 0 for t in proj_g)


class TestGenerate:
    def test_greedy_generate(self, tiny_llava):
        lcfg, ccfg, model, params = tiny_llava
        ids = make_prompt(2, 8)
        pixels = jnp.zeros((2, ccfg.image_size, ccfg.image_size, 3))
        out = greedy_generate(
            model, params, ids, pixels, max_new_tokens=6, eos_id=2
        )
        assert out["generated_ids"].shape == (2, 6)
        assert out["step_hidden"].shape == (2, 6, lcfg.hidden_size)
        Lp = 8 - 1 + ccfg.num_patches
        assert out["prompt_hidden"].shape == (2, Lp, lcfg.hidden_size)
        assert np.isfinite(np.asarray(out["step_hidden"])).all()

    def test_ragged_batch_matches_per_sample(self, tiny_llava):
        """Batched generate over ragged right-padded prompts must emit the
        same tokens as generating each sample alone (the padded-row
        correctness invariant: pad tokens must never be attended and the
        first-token gather must use each row's last VALID position)."""
        lcfg, ccfg, model, params = tiny_llava
        key = jax.random.PRNGKey(3)
        pixels = jax.random.normal(
            key, (2, ccfg.image_size, ccfg.image_size, 3)
        )
        short = make_prompt(1, 5, img_at=1)
        long = make_prompt(1, 9, img_at=1)

        # per-sample references
        ref_short = greedy_generate(
            model, params, short, pixels[:1], max_new_tokens=5, eos_id=2
        )
        ref_long = greedy_generate(
            model, params, long, pixels[1:], max_new_tokens=5, eos_id=2
        )

        # batched: right-pad the short row
        ids = np.zeros((2, 9), np.int32)
        ids[0, :5] = np.asarray(short[0])
        ids[1] = np.asarray(long[0])
        mask = np.zeros((2, 9), np.int32)
        mask[0, :5] = 1
        mask[1] = 1
        out = greedy_generate(
            model, params, jnp.asarray(ids), pixels,
            max_new_tokens=5, eos_id=2, attn_mask=jnp.asarray(mask),
        )
        got = np.asarray(out["generated_ids"])
        assert (got[0] == np.asarray(ref_short["generated_ids"])[0]).all()
        assert (got[1] == np.asarray(ref_long["generated_ids"])[0]).all()
        # hidden capture matches too (seg-token gather correctness)
        np.testing.assert_allclose(
            np.asarray(out["step_hidden"][1]),
            np.asarray(ref_long["step_hidden"][0]),
            atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["step_hidden"][0]),
            np.asarray(ref_short["step_hidden"][0]),
            atol=2e-4,
        )

    def test_int8_kv_cache_token_parity(self, tiny_llava):
        """int8 KV-cache greedy decode emits the same tokens as dense on
        the tiny config (north-star int8 decode, VERDICT r1 item 3)."""
        lcfg, ccfg, model, params = tiny_llava
        ids = make_prompt(2, 8)
        pixels = jnp.zeros((2, ccfg.image_size, ccfg.image_size, 3))
        dense = greedy_generate(
            model, params, ids, pixels, max_new_tokens=6, eos_id=2
        )
        int8 = greedy_generate(
            model, params, ids, pixels, max_new_tokens=6, eos_id=2,
            kv_cache="int8",
        )
        assert (
            np.asarray(dense["generated_ids"])
            == np.asarray(int8["generated_ids"])
        ).all()

    def test_generate_matches_teacher_forcing(self, tiny_llava):
        """Feed the generated tokens back through the full forward: the
        argmax at each position must reproduce the generated sequence."""
        lcfg, ccfg, model, params = tiny_llava
        ids = make_prompt(1, 6)
        pixels = jnp.zeros((1, ccfg.image_size, ccfg.image_size, 3))
        out = greedy_generate(
            model, params, ids, pixels, max_new_tokens=4, eos_id=2
        )
        gen = np.asarray(out["generated_ids"])[0]
        full = jnp.concatenate([ids, out["generated_ids"][:, :-1]], axis=1)
        fwd = model.apply(params, full, pixels)
        Lp = 6 - 1 + ccfg.num_patches
        logits = np.asarray(fwd.logits)[0]
        for t in range(4):
            if gen[t] == 2 and t > 0:
                break
            pred = logits[Lp - 1 + t].argmax()
            assert pred == gen[t], f"step {t}: {pred} != {gen[t]}"
