"""CLI: learnable-token + UNet fine-tuning with cross-attention regularization.

Flag-compatible with the reference's AttnDreamBooth-style trainer
(``data_generation/finetune_sd_token.py:190-566``): same flags, defaults and
mutual-exclusion rules, same two-invocation workflow
(stage 1 ``--train_token --with_cross_attn_reg --train_unet``; stage 2
``--embedding_path ... --train_unet --with_cross_attn_reg`` — see
``finetune_sd_token.sh`` / ``finetune_sd_token_stage2.sh``), same artifacts:
``learned_embeds_steps_N.bin`` and ``full_model_step_N/`` pipeline exports.

NOTE (parity): the reference's token .sh scripts omit ``--json_file_name``
although the script requires it; the training JSON schema is
``{image_path: prompt}`` (``dataset.py:19-22``).
"""

from __future__ import annotations

import argparse
import logging
import math
import os

import numpy as np

logger = logging.getLogger("agenda_tpu.finetune_sd_token")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Token/UNet fine-tuning (TPU).")
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None, required=True)
    p.add_argument("--revision", type=str, default=None)
    p.add_argument("--tokenizer_name", type=str, default=None)
    p.add_argument("--dataset_folder", type=str, default=None)
    p.add_argument("--json_file_name", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="text-inversion-model")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--sample_batch_size", type=int, default=4)
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--learning_rate", type=float, default=2e-6)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--scale_lr", action="store_true", default=False)
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--lr_num_cycles", type=int, default=1)
    p.add_argument("--lr_power", type=float, default=1.0)
    p.add_argument("--use_8bit_adam", action="store_true")
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-08)
    p.add_argument("--max_grad_norm", default=1.0, type=float)
    p.add_argument("--push_to_hub", action="store_true")
    p.add_argument("--hub_token", type=str, default=None)
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--allow_tf32", action="store_true")
    p.add_argument("--report_to", type=str, default="tensorboard")
    p.add_argument("--validation_prompts", type=str, default=None, nargs="+")
    p.add_argument("--num_validation_images", type=int, default=4)
    p.add_argument("--validation_steps", type=int, default=100)
    p.add_argument("--mixed_precision", type=str, default=None, choices=["no", "fp16", "bf16"])
    p.add_argument("--local_rank", type=int, default=-1)
    p.add_argument("--enable_xformers_memory_efficient_attention", action="store_true")
    p.add_argument("--set_grads_to_none", action="store_true")
    p.add_argument("--offset_noise", action="store_true", default=False)
    p.add_argument("--skip_save_text_encoder", action="store_true", required=False)
    p.add_argument("--validation_images", required=False, default=None, nargs="+")
    p.add_argument("--class_labels_conditioning", required=False, default=None)
    p.add_argument("--embedding_path", type=str, default=None)
    p.add_argument("--train_token", action="store_true", required=False, default=False)
    p.add_argument("--train_unet", action="store_true", required=False, default=False)
    p.add_argument("--object_token", type=str, default="sks")
    p.add_argument("--n_object_embedding", type=int, default=1)
    p.add_argument("--initialize_token", type=str, default=None, nargs="+")
    p.add_argument("--train_cross_attn", action="store_true", default=False)
    p.add_argument("--with_cross_attn_reg", default=False, action="store_true")
    p.add_argument("--reg_weight", type=float, default=1.0)
    p.add_argument("--only_save_checkpoint", action="store_true", default=False)
    p.add_argument("--load_from_checkpoint", type=str, default=None)
    p.add_argument("--tracker_project_name", type=str, default="tensorboard")
    # TPU extras
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--profile_dir", type=str, default=None)
    p.add_argument("--cache_latents", action="store_true", default=True,
                   help="Precompute per-image VAE latent moments once and "
                        "sample them in the step (exact — see "
                        "train/latent_cache.py). DEFAULT ON (r5 chip "
                        "measurement on the full-SD step: -19%% step time).")
    p.add_argument("--no_cache_latents", dest="cache_latents",
                   action="store_false",
                   help="Re-encode pixels in every step (reference behavior).")
    args = p.parse_args(argv)

    # Mutual-exclusion rules (finetune_sd_token.py:551-564).
    if args.dataset_folder is None or args.json_file_name is None:
        raise ValueError("Need either a dataset name or a data json file.")
    if not (args.train_token or args.train_unet or args.train_cross_attn):
        raise ValueError(
            "choose something to train! `--train_token`, `--train_cross_attn` or `--train_unet`"
        )
    if args.train_unet and args.train_cross_attn:
        raise ValueError("`--train_unet` cannot be used with `--train_cross_attn`")
    if (args.initialize_token is None or len(args.initialize_token) == 0) and not args.embedding_path:
        raise ValueError("You must specify at least one token for initialization.")
    if args.load_from_checkpoint is not None and args.resume_from_checkpoint is not None:
        raise ValueError("`--load_from_checkpoint` cannot be used with `--resume_from_checkpoint`")
    return args


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from agenda_tpu.core.schedules import make_schedule
    from agenda_tpu.data.datasets import DataLoader, TokenDataset
    from agenda_tpu.data.tokenizer import CLIPTokenizer
    from agenda_tpu.generate.pipeline import StableDiffusionPipeline
    from agenda_tpu.io.diffusers_io import (
        load_pipeline,
        load_unet,
        save_pipeline,
        unet_flax_to_torch,
    )
    from agenda_tpu.io.learned_embeds import load_learned_embeddings, save_learned_embeddings
    from agenda_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel
    from agenda_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from agenda_tpu.train.checkpoint import (
        AsyncWriter,
        atomic_checkpoint_dir,
        find_resume_checkpoint,
    )
    from agenda_tpu.train.finetune_sd_token import (
        TokenLossConfig,
        init_token_train_state,
        make_token_train_step,
        merge_params,
    )
    from agenda_tpu.train.optim import lr_schedule, make_optimizer
    from agenda_tpu.train.trackers import Tracker
    from agenda_tpu.utils.profiling import StepTimer, maybe_profile

    import dataclasses as dc
    import json

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s")
    os.makedirs(args.output_dir, exist_ok=True)
    seed = args.seed if args.seed is not None else 0

    bundle = load_pipeline(args.pretrained_model_name_or_path)
    sc = bundle.scheduler_config or {}
    schedule = make_schedule(
        num_train_timesteps=sc.get("num_train_timesteps", 1000),
        beta_start=sc.get("beta_start", 0.00085),
        beta_end=sc.get("beta_end", 0.012),
        beta_schedule=sc.get("beta_schedule", "scaled_linear"),
        prediction_type=sc.get("prediction_type", "epsilon"),
        steps_offset=sc.get("steps_offset", 1),
    )
    compute_dtype = jnp.float32 if args.mixed_precision == "no" else jnp.bfloat16

    tokenizer = CLIPTokenizer.from_pretrained(
        args.tokenizer_name or bundle.tokenizer_dir
    )

    # New tokens: from stage-1 embeddings or object_token_v{i} names
    # (finetune_sd_token.py:637-669).
    init_embedding = None
    if args.embedding_path is not None:
        embeds_dict = load_learned_embeddings(args.embedding_path)
        object_tokens = list(embeds_dict.keys())
        loaded_embeds = np.stack([embeds_dict[t] for t in object_tokens])
    else:
        object_tokens = [f"{args.object_token}_v{i}" for i in range(len(args.initialize_token))]
        loaded_embeds = None

    tokenizer.add_tokens(object_tokens)
    object_token_ids = tokenizer.convert_tokens_to_ids(object_tokens)

    # Extend the embedding table (resize_token_embeddings equivalent).
    text_cfg = bundle.text_config
    table = np.asarray(bundle.text_params["params"]["token_embedding"])
    need = max(object_token_ids) + 1
    if need > table.shape[0]:
        rng0 = np.random.RandomState(seed)
        extra = rng0.normal(0, 0.02, (need - table.shape[0], table.shape[1])).astype(table.dtype)
        table = np.concatenate([table, extra], axis=0)
    if loaded_embeds is not None:
        for tid, e in zip(object_token_ids, loaded_embeds):
            table[tid] = e
    text_params = dict(bundle.text_params)
    text_params["params"] = dict(text_params["params"])
    text_params["params"]["token_embedding"] = table
    text_cfg = dc.replace(text_cfg, vocab_size=table.shape[0])

    # Optionally load the UNet from a previous full checkpoint
    # (--load_from_checkpoint, finetune_sd_token.py:677-696).
    unet_cfg, unet_params = bundle.unet_config, bundle.unet_params
    if args.load_from_checkpoint:
        if os.path.exists(args.load_from_checkpoint):
            logger.info("Loading from checkpoint %s", args.load_from_checkpoint)
            unet_cfg, unet_params = load_unet(args.load_from_checkpoint)
        else:
            logger.info("Checkpoint '%s' does not exist. Starting a new training run.",
                        args.load_from_checkpoint)

    # Resume (finetune_sd_token.py:913-935 semantics: UNet weights +
    # learned embeddings + global step from checkpoint-N).
    initial_step = 0
    resume_embedding = None
    resume_train_state_path = None
    if args.resume_from_checkpoint:
        found = find_resume_checkpoint(args.output_dir, args.resume_from_checkpoint)
        if found is None:
            logger.info("Checkpoint '%s' does not exist. Starting a new training run.",
                        args.resume_from_checkpoint)
        else:
            initial_step, rpath = found
            logger.info("Resuming from checkpoint %s", rpath)
            unet_cfg, unet_params = load_unet(rpath)
            bin_path = os.path.join(rpath, f"learned_embeds_steps_{initial_step}.bin")
            if args.train_token and os.path.exists(bin_path):
                rd = load_learned_embeddings(bin_path)
                resume_embedding = np.stack([rd[t] for t in object_tokens])
            resume_train_state_path = os.path.join(rpath, "train_state")

    # flash_min_dim=40: memory-efficient flash backward on the D=40 latent
    # self-attentions (see kernels/attention.py docstring).
    unet = UNet2DConditionModel(unet_cfg, dtype=compute_dtype,
                                gradient_checkpointing=args.gradient_checkpointing,
                                flash_min_dim=40)
    vae = AutoencoderKL(bundle.vae_config, dtype=compute_dtype)
    text_encoder = CLIPTextModel(text_cfg, dtype=compute_dtype)

    dataset = TokenDataset(
        args.dataset_folder, args.json_file_name, args.resolution, tokenizer,
        word_tokens=args.initialize_token, new_tokens=object_tokens,
        device_resize=True,
    )
    resize_w = None
    if dataset.source_size is not None:
        # uniform source tiles: ship uint8, BILINEAR-resize on device
        # (the token finetuner resizes with bilinear, finetune_sd_token.py:816)
        from agenda_tpu.data.device_resize import resize_weights

        sw, sh = dataset.source_size
        resize_w = (resize_weights(sh, args.resolution, "bilinear"),
                    resize_weights(sw, args.resolution, "bilinear"))
        logger.info("device resize: %dx%d uint8 tiles -> %d² on chip",
                    sw, sh, args.resolution)

    mesh = make_mesh(dp=-1, fsdp=args.fsdp)
    global_bs = args.train_batch_size * mesh.shape["dp"]
    loader = DataLoader(dataset, global_bs, shuffle=True, seed=seed,
                        num_workers=max(1, args.dataloader_num_workers), pad_to_full=True)

    num_update_steps_per_epoch = math.ceil(len(loader) / args.gradient_accumulation_steps)
    if args.max_train_steps is None:
        args.max_train_steps = args.num_train_epochs * num_update_steps_per_epoch
    args.num_train_epochs = math.ceil(args.max_train_steps / num_update_steps_per_epoch)

    lr = args.learning_rate
    if args.scale_lr:
        lr = lr * args.gradient_accumulation_steps * args.train_batch_size * mesh.size
    lr_fn = lr_schedule(args.lr_scheduler, lr, args.lr_warmup_steps, args.max_train_steps,
                        args.lr_num_cycles, args.lr_power)
    # "auto": fused single-pass int8 AdamW when eligible
    # (kernels/fused_adamw.py); AGENDA_TPU_NO_FUSED_ADAMW=1 opts out.
    tx = make_optimizer(lr_fn, args.adam_beta1, args.adam_beta2, args.adam_weight_decay,
                        args.adam_epsilon, max_grad_norm=None,  # clip handled in step
                        gradient_accumulation_steps=args.gradient_accumulation_steps,
                        use_8bit_adam=args.use_8bit_adam, fused="auto")

    state = init_token_train_state(
        unet_params, tx, args.train_token, args.train_unet, args.train_cross_attn,
        n_tokens=len(object_tokens), hidden_size=text_cfg.hidden_size,
        rng=jax.random.key(seed),
        init_embedding=resume_embedding,
    )
    if initial_step and resume_train_state_path and os.path.isdir(resume_train_state_path):
        from agenda_tpu.train.checkpoint import restore_opt_payload

        restored = restore_opt_payload(
            resume_train_state_path,
            jax.eval_shape(lambda: {"opt_state": state.opt_state,
                                    "step": state.step}),
            state.opt_state,
            {"embedding": state.embedding, "unet": state.unet_trainable},
        )
        state = dc.replace(state, opt_state=restored["opt_state"],
                           step=jnp.asarray(restored["step"], jnp.int32))

    state = replicate(state, mesh)
    cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, compute_dtype), t)
    vae_params = replicate(cast(bundle.vae_params), mesh)

    if args.cache_latents:
        from agenda_tpu.train.latent_cache import (
            LatentMomentsDataset,
            precompute_latent_moments,
        )

        moments = precompute_latent_moments(
            vae, vae_params, dataset, batch_size=global_bs,
            resize_weights=resize_w, log_fn=logger.info,
        )
        dataset = LatentMomentsDataset(dataset, moments)
        # Same loader config => identical epoch shuffle stream.
        loader = DataLoader(dataset, global_bs, shuffle=True, seed=seed,
                            num_workers=max(1, args.dataloader_num_workers),
                            pad_to_full=True)
    text_params_dev = replicate(
        {"params": {**cast(text_params["params"]),
                    "token_embedding": jnp.asarray(table, jnp.float32)}},
        mesh,
    )

    loss_cfg = TokenLossConfig(
        snr_gamma=args.snr_gamma,
        offset_noise=args.offset_noise,
        with_cross_attn_reg=args.with_cross_attn_reg,
        reg_weight=args.reg_weight,
        n_object_embedding=args.n_object_embedding,
        train_token=args.train_token,
        max_grad_norm=args.max_grad_norm,
    )
    # Donate the train state (same rationale/escape hatch as finetune_sd).
    donate = () if os.environ.get("AGENDA_TPU_NO_DONATE") == "1" else (0,)
    step_fn = jax.jit(make_token_train_step(unet, vae, text_encoder, schedule, tx,
                                            loss_cfg, resize_weights=resize_w),
                      donate_argnums=donate)

    tracker = Tracker(os.path.join(args.output_dir, args.logging_dir), args.report_to,
                      config=vars(args))
    rng = jax.random.key(seed)

    logger.info("***** Running training *****")
    logger.info("  Num examples = %d", len(dataset))
    logger.info("  Total optimization steps = %d", args.max_train_steps)
    logger.info("  Mesh = %s, global batch = %d", dict(mesh.shape), global_bs)
    logger.info("  train_token=%s train_unet=%s train_cross_attn=%s reg=%s",
                args.train_token, args.train_unet, args.train_cross_attn,
                args.with_cross_attn_reg)

    def current_unet_params():
        # batched device_get: per-leaf np.asarray pays one tunnel RPC each
        trainable, frozen = jax.device_get(
            (state.unet_trainable, state.unet_frozen))
        return {"params": merge_params(trainable, frozen)}

    def current_table():
        t = np.array(np.asarray(text_params_dev["params"]["token_embedding"]))
        if args.train_token and state.embedding is not None:
            emb = np.asarray(state.embedding)
            for tid, row in zip(object_token_ids, emb):
                t[tid] = row
        return t

    def run_validation(step):
        if not args.validation_prompts:
            return
        tp = {"params": {**text_params_dev["params"],
                         "token_embedding": jnp.asarray(current_table())}}
        pipe = StableDiffusionPipeline(
            unet=unet, unet_params=current_unet_params(),
            vae=vae, vae_params=vae_params,
            text_encoder=text_encoder, text_params=tp,
            tokenizer=tokenizer, schedule=schedule, scheduler_type="pndm",
            latent_hw=unet_cfg.sample_size, dtype=compute_dtype,
        )
        for prompt in args.validation_prompts:
            present = [nt for it, nt in zip(args.initialize_token or [], object_tokens)
                       if it in prompt]
            formatted = prompt.format(*present)
            imgs, _ = pipe(formatted, seeds=list(range(args.num_validation_images)),
                           num_inference_steps=20,
                           height=args.resolution, width=args.resolution)
            tracker.log_images(f"validation/{formatted}", imgs, step)

    ckpt_writer = AsyncWriter()

    def save_ckpt(step):
        # Snapshot on the training thread (D2H copies only), write the files
        # on the AsyncWriter thread so the chip keeps training.
        unet_sd = unet_flax_to_torch(current_unet_params())
        embedding = np.asarray(state.embedding) if args.train_token else None
        opt_snap, step_snap = jax.device_get((state.opt_state, state.step))

        def payload(path):
            import orbax.checkpoint as ocp

            unet_dir = os.path.join(path, "unet")
            os.makedirs(unet_dir)
            from agenda_tpu.io.diffusers_io import unet_config_to_json, _write_safetensors
            with open(os.path.join(unet_dir, "config.json"), "w") as f:
                json.dump(unet_config_to_json(unet_cfg), f, indent=2)
            _write_safetensors(
                os.path.join(unet_dir, "diffusion_pytorch_model.safetensors"), unet_sd)
            if embedding is not None:
                save_learned_embeddings(
                    object_tokens, embedding,
                    os.path.join(path, f"learned_embeds_steps_{step}.bin"))
            # Optimizer state + step so resume continues the schedule/moments
            # (accelerate save_state semantics).
            ocp.PyTreeCheckpointer().save(
                os.path.abspath(os.path.join(path, "train_state")),
                {"opt_state": opt_snap, "step": step_snap},
            )

        def write():
            final_path = atomic_checkpoint_dir(
                args.output_dir, step, args.checkpoints_total_limit, payload)
            logger.info("Saved state to %s", final_path)

        ckpt_writer.submit(write, name=f"ckpt-write-{step}")

    # global_step counts optimizer updates; with --gradient_accumulation_steps
    # N every N micro-batches advance it once, and checkpoint/validation/
    # max_train_steps cadences key off it (finetune_sd_token.py:1095-1110).
    global_step = initial_step
    accum = args.gradient_accumulation_steps
    micro_in_step = 0
    timer = StepTimer()
    with maybe_profile(args.profile_dir), ckpt_writer:
        done = False
        for epoch in range(args.num_train_epochs):
            if done:
                break
            for batch in loader:
                if "latent_moments" in batch:
                    payload = {"latent_moments": batch["latent_moments"]}
                elif "pixel_u8" in batch:
                    payload = {"pixel_u8": batch["pixel_u8"]}
                else:
                    payload = {"pixel_values": batch["pixel_values"].astype(np.float32)}
                batch = shard_batch(
                    {**payload, "input_ids": batch["input_ids"],
                     "new_tokens_start": batch["new_tokens_start"]},
                    mesh,
                )
                state, metrics = step_fn(state, vae_params, text_params_dev, batch, rng)
                micro_in_step += 1
                if micro_in_step < accum:
                    continue  # mid-accumulation: no optimizer update happened
                micro_in_step = 0
                global_step += 1
                sps = timer.tick()
                if global_step % 10 == 0 or global_step <= 3:
                    m = {k: float(v) for k, v in metrics.items()}
                    m["lr"] = float(lr_fn(global_step))
                    m["steps_per_sec"] = sps
                    tracker.log(m, global_step)
                    logger.info(
                        "step %d: loss=%.5f attn=%.5f fg=%.5f bg=%.5f",
                        global_step, m["loss"], m["attn_loss"], m["fg_loss"], m["bg_loss"])
                if global_step % args.checkpointing_steps == 0:
                    save_ckpt(global_step)
                if args.validation_prompts and global_step % args.validation_steps == 0:
                    run_validation(global_step)
                if global_step >= args.max_train_steps:
                    done = True
                    break

    ckpt_writer.wait()  # surface any pending checkpoint-write error
    # Final artifacts (finetune_sd_token.py:1175-1187).
    if args.train_token:
        save_learned_embeddings(
            object_tokens, np.asarray(state.embedding),
            os.path.join(args.output_dir, f"learned_embeds_steps_{global_step}.bin"))
    if not args.only_save_checkpoint and (args.train_unet or args.train_cross_attn):
        save_path = os.path.join(args.output_dir, f"full_model_step_{global_step}")
        if not os.path.exists(save_path):
            save_pipeline(
                save_path, unet_cfg, current_unet_params(),
                bundle.vae_config, bundle.vae_params,
                text_cfg, {"params": {**bundle.text_params["params"],
                                      "token_embedding": current_table()}},
                tokenizer_dir=bundle.tokenizer_dir,
                scheduler_config=bundle.scheduler_config,
            )
            tokenizer.save_pretrained(os.path.join(save_path, "tokenizer"))
    tracker.close()


if __name__ == "__main__":
    main()
