"""Data-layer tests: conversation templating, image-token tokenization,
target masking, transforms, and collate shapes."""

import numpy as np
import pytest

from interactvlm_tpu.data.collate import Sample, collate, task_id_for
from interactvlm_tpu.data.conversations import (
    get_conversation_template,
)
from interactvlm_tpu.data.tokenization import (
    build_targets,
    tokenizer_image_token,
    tokenize_conversations,
    wrap_image_tokens,
)
from interactvlm_tpu.data.transforms import (
    clip_preprocess,
    resize_longest_side,
    sam_preprocess,
    valid_region_mask,
)
from interactvlm_tpu.utils.constants import (
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
)
from interactvlm_tpu.utils.testing import WhitespaceTokenizer


def make_conversation(question="segment the chair", answer="It is [SEG]."):
    conv = get_conversation_template("llava_v1")
    conv.append_message(conv.roles[0], "<image>\n" + question)
    conv.append_message(conv.roles[1], answer)
    return conv.get_prompt()


class TestConversations:
    def test_llava_v1_prompt_structure(self):
        p = make_conversation()
        assert p.startswith("A chat between")
        assert "USER: <image>\nsegment the chair ASSISTANT: It is [SEG].</s>" in p

    def test_empty_assistant_for_generation(self):
        conv = get_conversation_template("llava_v1")
        conv.append_message(conv.roles[0], "<image>\nq")
        conv.append_message(conv.roles[1], None)
        p = conv.get_prompt()
        assert p.endswith("ASSISTANT:")

    def test_llama2_wrapping(self):
        conv = get_conversation_template("llava_llama_2")
        conv.append_message(conv.roles[0], "q")
        conv.append_message(conv.roles[1], "a")
        p = conv.get_prompt()
        assert "[INST]" in p and "[/INST]" in p and "<<SYS>>" in p


class TestTokenization:
    def test_image_token_insertion(self):
        tok = WhitespaceTokenizer()
        ids = tokenizer_image_token("hello <image> world", tok)
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        assert ids[0] == tok.bos_token_id

    def test_wrap_image_tokens(self):
        s = wrap_image_tokens("<image>\nfoo")
        assert s.startswith("<im_start><image><im_end>")

    def test_target_masking(self):
        tok = WhitespaceTokenizer()
        conv = make_conversation(answer="Sure , it is [SEG] .")
        wrapped = wrap_image_tokens(conv)
        ids = tokenizer_image_token(wrapped, tok)
        targets = build_targets(wrapped, ids, tok)
        # [SEG] supervised, system prompt ignored
        seg_id = tok.vocab["[SEG]"]
        seg_pos = ids.index(seg_id)
        assert targets[seg_pos] == seg_id
        assert (targets[:5] == IGNORE_INDEX).all()
        # the ignored fraction covers at least the instruction
        assert (targets == IGNORE_INDEX).mean() > 0.4

    def test_tokenize_conversations_shapes(self):
        tok = WhitespaceTokenizer()
        convs = [make_conversation(), make_conversation("segment the dog")]
        out = tokenize_conversations(convs, tok, max_len=64)
        assert out["input_ids"].shape == (2, 64)
        assert out["labels"].shape == (2, 64)
        assert (out["labels"][out["attn_mask"] == 0] == IGNORE_INDEX).all()


class TestTransforms:
    def test_resize_longest_side(self):
        img = np.zeros((100, 50, 3), np.uint8)
        out = resize_longest_side(img, 64)
        assert out.shape[:2] == (64, 32)

    def test_sam_preprocess_pads(self):
        img = np.full((100, 50, 3), 128, np.uint8)
        out, (h, w) = sam_preprocess(img, 64)
        assert out.shape == (64, 64, 3)
        assert (h, w) == (64, 32)
        assert np.allclose(out[:, w:], 0)  # right padding zero

    def test_clip_preprocess(self):
        img = np.full((60, 60, 3), 255, np.uint8)
        out = clip_preprocess(img, 28)
        assert out.shape == (28, 28, 3)
        assert out.max() < 3  # normalized

    def test_valid_region_mask(self):
        img = np.full((4, 4, 3), 255, np.uint8)
        img[1, 1] = 100
        m = valid_region_mask(img)
        assert m.sum() == 1 and m[1, 1]


class TestCollate:
    def test_task_ids(self):
        assert task_id_for("hcontact_damon") == 2
        assert task_id_for("oafford_piad") == 3
        assert task_id_for("ocontact_pico") == 4
        assert task_id_for("vqa") == 0
        assert task_id_for("refer_seg||refcoco") == 1

    def test_collate_shapes_and_view_repeat(self):
        tok = WhitespaceTokenizer()
        V, S, Sc, H = 4, 32, 28, 16

        def sample(ds, views):
            return Sample(
                image_path="x.jpg",
                sam_images=np.zeros((views, S, S, 3), np.float32),
                image_clip=np.zeros((Sc, Sc, 3), np.float32),
                conversations=[make_conversation()],
                masks=np.zeros((views, H, H), np.float32),
                label=np.zeros((H, H), np.float32),
                gt_contact_3d=np.zeros(64, np.float32),
                cam_params=np.zeros((views, 5), np.float32),
                resize=(S, S),
                questions=["q"],
                sampled_classes=["chair"],
                ds_name=ds,
                mask_paths=["m.png"],
            )

        batch, meta = collate(
            [sample("hcontact", 4), sample("vqa", 1)],
            tok, max_len=300, multiview_channels=V,
            num_human_vertices=64, num_object_points=32,
        )
        assert batch["sam_images"].shape == (2, V, S, S, 3)
        assert batch["gt_masks"].shape == (2, V, H, H)
        assert batch["cam_params"].shape == (2, V, 5)
        assert batch["input_ids"].shape == (2, 300 - 255)
        assert list(batch["task_ids"]) == [2, 0]
        assert batch["gt_hcontact"].shape == (2, 64)
        assert meta["ds_name_list"] == ["hcontact", "vqa"]
