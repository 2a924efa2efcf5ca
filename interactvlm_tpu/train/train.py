"""Training driver CLI.

Rebuild of the reference ``train.py`` (:30-148 args, :421-632 loop): builds
the tokenizer + seg tokens, the composite model, the (data, model) mesh and
sharded train state, the hybrid dataset mixture, then runs the
epoch / validate / best-checkpoint loop. DeepSpeed's engine is replaced by
the pjit train step (``train_step.py``); wall-clock meters and the NaN-loss
skip guard (train.py:547-551) are preserved.

Supports ``--synthetic`` for smoke runs without data or a real tokenizer.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("interactvlm_tpu training")
    # experiment / io (reference train.py:30-60)
    p.add_argument("--exp_name", default="ivlm_tpu")
    p.add_argument("--log_base_dir", default="./runs")
    p.add_argument("--dataset_dir", default="./data")
    p.add_argument("--version", default=None,
                   help="HF model dir for tokenizer/weights")
    p.add_argument("--tokenizer", default="hf",
                   choices=["hf", "whitespace"],
                   help="'whitespace' = offline deterministic tokenizer "
                        "(tests / zero-egress runs)")
    p.add_argument("--model_scale", default="full",
                   choices=["full", "tiny"],
                   help="'tiny' = tiny towers + REAL data path (the "
                        "closed-loop learning tests)")
    p.add_argument("--image_size", type=int, default=1024,
                   help="SAM view render size fed to the datasets")
    p.add_argument("--clip_size", type=int, default=224)
    p.add_argument("--num_human_vertices", type=int, default=6890)
    p.add_argument("--num_object_points", type=int, default=2048,
                   help="point-cloud size for oafford gt/lift (reference "
                        "2048-point clouds, ocontact_3d.py)")
    p.add_argument("--num_conversations", type=int, default=1,
                   help="conversations per image row block (reference "
                        "num_classes_per_sample, dataset.py:196)")
    # schedule (train.py:83-99; run_train.sh presets)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--steps_per_epoch", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--grad_accumulation_steps", type=int, default=1)
    p.add_argument("--data_workers", type=int, default=8,
                   help="sample-construction threads (reference "
                        "DataLoader workers, train.py:334-352)")
    p.add_argument("--prefetch_depth", type=int, default=4)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--model_max_length", type=int, default=512)
    # model
    p.add_argument("--token_type", default="Gen")
    p.add_argument("--max_seg_tokens", type=int, default=0,
                   help="seg-token slots supervised per row (reference "
                        "trains one mask set per seg token, InteractVLM"
                        ".py:389-410). 0 = auto: 2 for Gen-Hu-Obj/Gen-Int "
                        "(a row can carry [HSEG]+[OSEG]), else 1")
    p.add_argument("--hC_sam_view_type", default="4MV-Z_Vitru_mv2")
    p.add_argument("--oC_sam_view_type", default="4MV-Z_HM")
    p.add_argument("--multiview_channels", type=int, default=4)
    p.add_argument("--multiview_cam_cond", action="store_true", default=True)
    p.add_argument("--cam_encoder_type", default="simple")
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--int8_base", action="store_true",
                   help="QLoRA: freeze the LLaMA base in int8 (STE "
                        "activation grads, ops/quant.py) while the bf16 "
                        "LoRA adapters + heads train. The only 7B-LoRA "
                        "configuration that fits ONE 16 GB v5e chip "
                        "(utils/memory.training_budget); the reference's "
                        "bnb-int8 role (run_demo.py:106-129) extended to "
                        "training.")
    # losses (train.py:100-120)
    p.add_argument("--ce_loss_weight", type=float, default=1.0)
    p.add_argument("--bce_loss_weight", type=float, default=2.0)
    p.add_argument("--bce_loss_alpha", type=float, default=0.5)
    p.add_argument("--dice_loss_weight", type=float, default=1.0)
    p.add_argument("--dice_loss_scale", type=float, default=1.0)
    p.add_argument("--hC_loss_weight", type=float, default=3.0)
    p.add_argument("--oC_loss_weight", type=float, default=1.0)
    # data mixture (train.py:61-82)
    p.add_argument("--dataset", default="hcontact")
    p.add_argument("--sample_rates", default="1")
    p.add_argument("--hC_question_type", default="parts")
    p.add_argument("--oC_question_type", default="simple")
    p.add_argument("--fixed_templates", action="store_true",
                   help="always use the FIRST question/answer template "
                        "(sample order stays random) -- for offline "
                        "closed-loop tests where template variety only "
                        "slows the tiny model's convergence. Contact "
                        "datasets only (other sets pick CONTENT with the "
                        "same rng; build_dataset rejects them)")
    # parallelism
    p.add_argument("--n_model_shards", type=int, default=1)
    # runtime
    p.add_argument("--resume", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data + tiny model smoke run")
    p.add_argument("--mask_size", type=int, default=32,
                   help="synthetic-mode label size")
    p.add_argument("--val_every", type=int, default=1)
    p.add_argument("--val_batches", type=int, default=50,
                   help="max validation batches per epoch gate")
    p.add_argument("--val_max_new_tokens", type=int, default=32,
                   help="generation budget for the TRAIN-TIME epoch gate "
                        "(short on purpose: the gate ranks checkpoints, "
                        "it is not the reference-protocol eval; the eval "
                        "CLI defaults to 512 like reference "
                        "evaluate.py:104)")
    p.add_argument("--save_every", type=int, default=1)
    p.add_argument("--no_eval", action="store_true")
    p.add_argument("--profile_steps", type=int, default=0,
                   help="capture a jax.profiler trace for N steps")
    p.add_argument("--no_tensorboard", action="store_true")
    return p.parse_args(argv)


def resolve_max_seg_tokens(args) -> int:
    """0/absent = auto: 2 slots for the interaction token types whose rows
    can carry both [HSEG] and [OSEG] (reference InteractVLM.py:389-410
    decodes one mask set per token), 1 otherwise."""
    k = getattr(args, "max_seg_tokens", 0)
    if k:
        return k
    base = getattr(args, "token_type", "Gen").replace("-DifDe", "")
    return 2 if base in ("Gen-Hu-Obj", "Gen-Int") else 1


def build_model_and_config(args, vocab_size=None, seg_token_idx=None,
                           hseg_token_idx=None, oseg_token_idx=None):
    """Build the composite model.

    Token registration MUST precede the model build: the [SEG]/[HSEG]/[OSEG]
    ids live past the base 32000 vocab, so ``vocab_size`` must already
    account for them or embed_tokens/lm_head can never represent them
    (reference adds tokens before from_pretrained + resize, train.py:163-179,
    utils/utils.py:335-362).
    """
    from interactvlm_tpu import config as cfgs
    from interactvlm_tpu.models.interactvlm import InteractVLM

    max_seg = resolve_max_seg_tokens(args)
    if args.synthetic:
        llama = cfgs.llama_tiny(lora_rank=args.lora_r and 4)
        cfg = cfgs.interactvlm_tiny(llama=llama, max_seg_tokens=max_seg)
    elif getattr(args, "model_scale", "full") == "tiny":
        # tiny towers on the REAL data path (closed-loop learning tests)
        llama = cfgs.llama_tiny(lora_rank=args.lora_r and 4)
        tiny_kw = {}
        if seg_token_idx is not None:
            tiny_kw = dict(seg_token_idx=seg_token_idx,
                           hseg_token_idx=hseg_token_idx,
                           oseg_token_idx=oseg_token_idx)
        cfg = cfgs.interactvlm_tiny(
            llama=llama, **tiny_kw,
            token_type=args.token_type,
            max_seg_tokens=max_seg,
            hC_sam_view_type=args.hC_sam_view_type,
            oC_sam_view_type=args.oC_sam_view_type,
            multiview_channels=args.multiview_channels,
            multiview_cam_cond=args.multiview_cam_cond,
            cam_encoder_type=args.cam_encoder_type,
            num_human_vertices=args.num_human_vertices,
            num_object_points=getattr(args, "num_object_points", 2048),
            ce_loss_weight=args.ce_loss_weight,
            bce_loss_weight=args.bce_loss_weight,
            bce_loss_alpha=args.bce_loss_alpha,
            dice_loss_weight=args.dice_loss_weight,
            dice_loss_scale=args.dice_loss_scale,
            hC_loss_weight=args.hC_loss_weight,
            oC_loss_weight=args.oC_loss_weight,
        )
    else:
        llama_kw = dict(lora_rank=args.lora_r, lora_alpha=args.lora_alpha,
                        weights_int8=getattr(args, "int8_base", False))
        if vocab_size is not None:
            llama_kw["vocab_size"] = vocab_size
        tok_kw = {}
        if seg_token_idx is not None:
            tok_kw = dict(
                seg_token_idx=seg_token_idx,
                hseg_token_idx=hseg_token_idx,
                oseg_token_idx=oseg_token_idx,
            )
        cfg = cfgs.InteractVLMConfig(
            llama=cfgs.llama_13b(**llama_kw),
            **tok_kw,
            num_human_vertices=args.num_human_vertices,
            num_object_points=getattr(args, "num_object_points", 2048),
            token_type=args.token_type,
            max_seg_tokens=max_seg,
            hC_sam_view_type=args.hC_sam_view_type,
            oC_sam_view_type=args.oC_sam_view_type,
            multiview_channels=args.multiview_channels,
            multiview_cam_cond=args.multiview_cam_cond,
            cam_encoder_type=args.cam_encoder_type,
            ce_loss_weight=args.ce_loss_weight,
            bce_loss_weight=args.bce_loss_weight,
            bce_loss_alpha=args.bce_loss_alpha,
            dice_loss_weight=args.dice_loss_weight,
            dice_loss_scale=args.dice_loss_scale,
            hC_loss_weight=args.hC_loss_weight,
            oC_loss_weight=args.oC_loss_weight,
        )
    return InteractVLM(cfg), cfg


def synthetic_batch_iter(cfg, batch_size, mask_size, seed=0):
    from interactvlm_tpu.utils.testing import make_synthetic_batch

    i = 0
    while True:
        yield make_synthetic_batch(
            cfg, B=batch_size, mask_size=mask_size, seed=seed + i
        )
        i += 1


def _load_human_maps(dataset_dir):
    """Find the Vitruvian p2v/bary lift maps: either the consolidated
    ``human_lift_maps.npz`` or the datagen tree's
    ``hcontact_vitruvian_mv2/lift_maps.npz`` (datagen/recipes.py).

    Returns CORNER-MAJOR (3, V, H, W) host arrays -- the device-side lift
    layout (trailing-3 maps tile-pad 42.7x in TPU HBM; see
    ``geometry.lift.corner_major``). The on-disk layout stays (V, H, W, 3).
    """
    from interactvlm_tpu.geometry.lift import corner_major

    for rel in ("human_lift_maps.npz",
                os.path.join("hcontact_vitruvian_mv2", "lift_maps.npz")):
        path = os.path.join(dataset_dir, rel)
        if os.path.exists(path):
            maps_npz = np.load(path)
            return {
                "p2v": corner_major(np.asarray(maps_npz["p2v"], np.int32)),
                "bary": corner_major(
                    np.asarray(maps_npz["bary"], np.float32)),
            }
    return None


def real_batch_iter(args, cfg, tokenizer):
    """Hybrid-dataset loader with a background prefetch thread."""
    from interactvlm_tpu.data.collate import collate
    from interactvlm_tpu.data.datasets import HybridDataset
    from interactvlm_tpu.runtime.prefetch import PrefetchIterator

    from interactvlm_tpu.data.datasets import build_dataset

    names = args.dataset.split("||")
    rates = [float(r) for r in args.sample_rates.split(",")]
    if len(rates) != len(names):
        rates = [1.0] * len(names)
    datasets = [
        build_dataset(name, args.dataset_dir, "train", args)
        for name in names
    ]
    hybrid = HybridDataset(
        datasets, rates,
        samples_per_epoch=args.batch_size
        * args.grad_accumulation_steps
        * args.steps_per_epoch,
    )

    # object lift maps ride every batch iff the mixture contains object
    # datasets (fixed per run so the jit batch structure stays static)
    include_object_maps = any(n in ("oafford", "ocontact") for n in names)

    # human lift maps: without them the hC 3D loss silently drops out of
    # real-data training (reference loads the fixed Vitruvian p2v/bary
    # maps per view set, components.py:204-218)
    human_maps = _load_human_maps(args.dataset_dir)

    # Per-sample construction (B x V 1024^2 PNG decodes per batch) runs on
    # a thread pool: the C++ decoder releases the GIL so threads scale
    # (reference uses multi-worker DataLoaders, train.py:334-352). A
    # serial generator here measured input-bound at real image sizes
    # (VERDICT r2 #5).
    from interactvlm_tpu.runtime.prefetch import ParallelSampler

    workers = getattr(args, "data_workers", 8)
    sampler = ParallelSampler(
        lambda i: hybrid[i % len(hybrid)], num_workers=workers,
        lookahead=max(2 * args.batch_size, workers),
    )

    def indices():
        i = 0
        while True:
            yield i
            i += 1

    def gen():
        sample_it = sampler.iterate(indices())
        while True:
            samples = [next(sample_it) for _ in range(args.batch_size)]
            batch, _ = collate(
                samples, tokenizer, max_len=args.model_max_length,
                multiview_channels=args.multiview_channels,
                include_object_maps=include_object_maps,
                human_maps=human_maps,
                num_human_vertices=cfg.num_human_vertices,
                num_object_points=cfg.num_object_points,
                num_conversations=getattr(args, "num_conversations", 1),
                max_seg_tokens=cfg.max_seg_tokens,
            )
            yield batch

    return PrefetchIterator(gen(), depth=getattr(args, "prefetch_depth", 4))


def make_validator(args, cfg, model, tokenizer, example, mesh=None):
    """Generate-mode validation closure for the epoch gate (reference
    train.py:421-472 validates and gates best-checkpoint saving on the
    contact metric, not train loss)."""
    from interactvlm_tpu.eval.evaluate import validate

    if args.synthetic:
        from interactvlm_tpu.utils.testing import make_synthetic_batch

        human_maps = {
            "p2v": example["human_p2v"], "bary": example["human_bary"],
            "num_vertices": cfg.num_human_vertices,
        }

        def batches():
            for i in range(2):
                b = make_synthetic_batch(
                    cfg, B=args.batch_size, tasks=(2,),
                    mask_size=args.mask_size, seed=10_000 + i,
                )
                meta = {
                    "image_paths": [f"val{i}_{j}.jpg"
                                    for j in range(args.batch_size)],
                    "sampled_classes_list": [["chair"]] * args.batch_size,
                }
                yield b, meta

        mask_size = args.mask_size
        ds_name = "hcontact"
    else:
        from interactvlm_tpu.data.collate import collate
        from interactvlm_tpu.data.datasets import ValDataset, build_dataset

        name = args.dataset.split("||")[0]
        # same construction path as training + the eval CLI, so the val
        # prompts/views match what training saw by construction
        ds = ValDataset(build_dataset(name, args.dataset_dir, "val", args))
        mask_size = (
            args.image_size
            if args.image_size != 1024
            else ds.dataset.view_set.mask_size
        )
        ds_name = name
        human_maps = _load_human_maps(args.dataset_dir)
        if human_maps is not None:
            human_maps = {
                **human_maps, "num_vertices": cfg.num_human_vertices,
            }

        def batches():
            from interactvlm_tpu.runtime.prefetch import iter_sample_batches

            for samples in iter_sample_batches(
                ds, args.batch_size,
                limit=args.val_batches * args.batch_size,
                num_workers=getattr(args, "data_workers", 8),
            ):
                yield collate(samples, tokenizer,
                              max_len=args.model_max_length,
                              multiview_channels=args.multiview_channels,
                              num_human_vertices=cfg.num_human_vertices,
                              num_object_points=cfg.num_object_points,
                              human_maps=human_maps,
                              include_object_maps=name in
                              ("oafford", "ocontact"))

    def val_fn(params):
        # distributed eval: shard every batch over the mesh's data axis
        # (reference DistributedSampler + all_gather, evaluate.py:202-346)
        results, _ = validate(
            batches(), model, params, cfg, ds_name, mask_size,
            human_maps=human_maps, mesh=mesh,
            max_new_tokens=getattr(args, "val_max_new_tokens", 32),
        )
        # contact F1 is the gate when available (reference train.py:434-453)
        return results.get("f1", results.get("giou", 0.0)), results

    return val_fn


def main(argv=None):
    args = parse_args(argv)

    import jax

    from interactvlm_tpu.runtime.hostmem import tune_host_allocator

    tune_host_allocator()

    from interactvlm_tpu.parallel.mesh import create_mesh
    from interactvlm_tpu.train.checkpoints import (
        CheckpointManager,
        save_config,
    )
    from interactvlm_tpu.train.optimizer import make_optimizer, trainable_mask
    from interactvlm_tpu.train.train_step import (
        create_sharded_state,
        make_train_step,
    )
    from interactvlm_tpu.utils.meters import AverageMeter

    run_dir = os.path.join(args.log_base_dir, args.exp_name)
    os.makedirs(run_dir, exist_ok=True)

    # tokenizer + seg tokens FIRST, then the model, so the vocab table and
    # token indices are correct from construction (reference train.py:163-179)
    tokenizer = None
    token_kw = {}
    if not args.synthetic:
        from interactvlm_tpu.utils.constants import add_new_tokens

        if args.tokenizer == "whitespace":
            # offline deterministic tokenizer (zero-egress closed loop)
            from interactvlm_tpu.utils.testing import WhitespaceTokenizer

            tokenizer = WhitespaceTokenizer(args.model_max_length)
        else:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(
                args.version, model_max_length=args.model_max_length
            )
            tokenizer.pad_token = tokenizer.unk_token
        tokenizer, seg, hseg, oseg = add_new_tokens(
            tokenizer, args.token_type
        )
        token_kw = dict(
            seg_token_idx=seg,
            hseg_token_idx=hseg, oseg_token_idx=oseg,
        )
        if args.tokenizer != "whitespace":
            token_kw["vocab_size"] = len(tokenizer)

    model, cfg = build_model_and_config(args, **token_kw)
    save_config(
        run_dir, {**vars(args), **token_kw}, "pretrained_config.json"
    )
    save_config(run_dir, cfg, "config.json")
    from interactvlm_tpu.utils.profiling import (
        MetricLogger,
        copy_code_snapshot,
        mask_panel,
    )

    copy_code_snapshot(run_dir)
    logger = MetricLogger(run_dir, use_tb=not args.no_tensorboard)

    n = len(jax.devices())
    n_model = min(args.n_model_shards, n)
    mesh = create_mesh(n_data=n // n_model, n_model=n_model)

    if args.synthetic:
        batches = synthetic_batch_iter(cfg, args.batch_size, args.mask_size)
    else:
        batches = real_batch_iter(args, cfg, tokenizer)

    example = next(batches)
    total_steps = args.epochs * args.steps_per_epoch
    tx, sched = make_optimizer(
        lr=args.lr, warmup_steps=args.warmup_steps,
        total_steps=total_steps, mask=trainable_mask,
    )

    accum = max(1, args.grad_accumulation_steps)
    if accum > 1:
        import jax.numpy as jnp

        def stack_accum(batches_iter):
            while True:
                group = [next(batches_iter) for _ in range(accum)]
                yield jax.tree.map(
                    lambda *xs: jnp.stack(xs), *group
                )

        batches = stack_accum(iter(batches))
        example = next(batches)

    with mesh:
        state, shardings = create_sharded_state(
            model, tx,
            jax.tree.map(lambda x: x[0], example) if accum > 1 else example,
            mesh,
            # frozen params stored in the compute dtype (bit-identical
            # under the dtype'd modules; halves frozen SAM/CLIP HBM)
            frozen_dtype=cfg.llama.dtype,
        )
        step_fn = make_train_step(
            model, tx, mesh, shardings, example, accum_steps=accum
        )

        ckpt = CheckpointManager(run_dir)
        if args.resume:
            restored = ckpt.restore(state)
            if restored is not None:
                state = restored
                print(f"resumed from step {int(state.step)}")

        batch_time = AverageMeter("batch_time")
        data_time = AverageMeter("data_time")
        start_epoch = int(state.step) // args.steps_per_epoch
        first_micro = (
            jax.tree.map(lambda x: x[0], example) if accum > 1 else example
        )
        val_fn = None
        # one jit wrapper for the image-panel forward: a fresh jax.jit per
        # epoch would recompile every validation (the axon remote compile
        # bypasses the local cache)
        panel_fn = jax.jit(model.apply)

        for epoch in range(start_epoch, args.epochs):
            for it in range(args.steps_per_epoch):
                t0 = time.time()
                batch = example if it == 0 and epoch == start_epoch else next(
                    batches
                )
                data_time.update(time.time() - t0)

                if args.profile_steps and it == 1 and epoch == start_epoch:
                    jax.profiler.start_trace(
                        os.path.join(run_dir, "profile")
                    )
                state, metrics = step_fn(state, batch)
                if args.profile_steps and it == args.profile_steps and (
                    epoch == start_epoch
                ):
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()

                batch_time.update(time.time() - t0)
                if it % 10 == 0:
                    loss = float(metrics["loss"])
                    if float(metrics.get("skipped_nonfinite", 0.0)) > 0:
                        # NaN guard: the compiled step already dropped this
                        # update (reference train.py:547-551 skips the batch)
                        print(f"WARNING: non-finite loss at {epoch}:{it}; "
                              "update skipped")
                    lr_now = float(sched(int(state.step)))
                    logger.log(int(state.step), {
                        **{k: v for k, v in metrics.items()},
                        "lr": lr_now,
                        "train/total_secs_per_batch": batch_time.avg,
                        "train/data_secs_per_batch": data_time.avg,
                    })
                    print(
                        f"epoch {epoch} step {it}/{args.steps_per_epoch} "
                        f"loss {loss:.4f} "
                        f"ce {float(metrics.get('ce_loss', 0.0)):.4f} "
                        f"mask {float(metrics.get('mask_loss', 0.0)):.4f} "
                        f"lr {lr_now:.2e} "
                        f"sec/batch {batch_time.avg:.3f}"
                    )

            if (epoch + 1) % args.save_every == 0:
                ckpt.save(int(state.step), state)
            if not args.no_eval and (epoch + 1) % args.val_every == 0:
                if val_fn is None:
                    val_fn = make_validator(args, cfg, model, tokenizer,
                                            first_micro, mesh=mesh)
                score, vres = val_fn(state.params)
                logger.log(int(state.step),
                           {f"val/{k}": v for k, v in vres.items()})
                # image panel: CLIP | SAM view | pred | GT on one sample
                # (reference utils/utils.py:457-470)
                fwd = panel_fn(state.params, first_micro)
                pm = np.asarray(fwd["pred_masks"])
                gm = np.asarray(first_micro["gt_masks"])
                if pm.ndim == 5:  # K-seg-slot path: panel shows slot 0
                    pm, gm = pm[:, 0], gm[:, 0]
                logger.log_images(
                    int(state.step), "val/panel",
                    mask_panel(
                        np.asarray(first_micro["images_clip"][0]),
                        np.asarray(first_micro["sam_images"][0, 0]),
                        pm[0, 0], gm[0, 0],
                    ),
                )
                print(f"epoch {epoch} val: "
                      + " ".join(f"{k}={v:.4f}" for k, v in vres.items()))
                if ckpt.save_best(int(state.step), state, score):
                    print(f"new best at step {int(state.step)}: {score:.4f}")

    logger.close()
    print("training done")
    return state


if __name__ == "__main__":
    main()
