"""Deployment export: fold LoRA adapters and save inference params.

Rebuild of the reference's ``merge_lora_weights_and_save_hf_model.py``
(zero_to_fp32 -> rebuild -> merge_and_unload -> save): restores a training
checkpoint, merges the LoRA adapters into the base LLaMA kernels, strips
optimizer state, and writes an inference-only orbax checkpoint (+ config).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser("interactvlm_tpu export")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--use_best", action="store_true", default=True)
    args = p.parse_args(argv)

    import jax
    import flax.linen as nn
    import orbax.checkpoint as ocp

    from interactvlm_tpu.train.checkpoints import (
        CheckpointManager,
        load_config,
        save_config,
    )
    from interactvlm_tpu.utils.weights import merge_lora

    cfg_json = load_config(args.run_dir, "pretrained_config.json")

    # rebuild the abstract state to restore into
    from interactvlm_tpu.train.train import build_model_and_config, parse_args

    train_args = parse_args([])
    for k, v in cfg_json.items():
        if hasattr(train_args, k):
            setattr(train_args, k, v)
    model, cfg = build_model_and_config(train_args)

    from interactvlm_tpu.utils.testing import make_synthetic_batch

    example = make_synthetic_batch(cfg, B=1, mask_size=train_args.mask_size)
    abstract = jax.eval_shape(
        lambda: nn.meta.unbox(model.init(jax.random.PRNGKey(0), example))
    )

    ckpt = CheckpointManager(args.run_dir)
    from interactvlm_tpu.train.optimizer import make_optimizer, trainable_mask
    from interactvlm_tpu.train.train_step import TrainState

    tx, _ = make_optimizer(mask=trainable_mask)
    abstract_state = TrainState(
        step=jax.ShapeDtypeStruct((), "int32"),
        params=abstract,
        opt_state=jax.eval_shape(tx.init, abstract),
    )
    state = (
        ckpt.restore_best(abstract_state)
        if args.use_best and os.path.exists(ckpt.best_dir)
        else ckpt.restore(abstract_state)
    )
    assert state is not None, f"no checkpoint found in {args.run_dir}"

    params = state.params["params"]
    rank = cfg.llama.lora_rank
    if rank > 0:
        params = merge_lora(params, cfg.llama.lora_alpha, rank)

    os.makedirs(args.out_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(os.path.join(args.out_dir, "params")),
        {"params": params},
    )
    ckptr.wait_until_finished()
    save_config(args.out_dir, cfg_json, "pretrained_config.json")
    print(f"exported merged inference params -> {args.out_dir}")


if __name__ == "__main__":
    main()
