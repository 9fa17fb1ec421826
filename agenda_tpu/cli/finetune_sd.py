"""CLI: full SD UNet fine-tuning on a TPU mesh.

Flag-compatible with the reference trainer
(``data_generation/finetune_sd.py:147-425`` — same names, same defaults,
same semantics) so launch scripts port by swapping
``accelerate launch finetune_sd.py`` for ``python -m agenda_tpu.cli.finetune_sd``.
Differences, by design:

- no process-per-GPU launcher: one process drives the whole mesh (pjit/SPMD);
  multi-host slices initialize via ``jax.distributed`` automatically when the
  TPU runtime provides coordination env vars;
- ``--train_batch_size`` stays per-device (global = bs x n_devices x accum),
  matching accelerate semantics;
- ``--use_8bit_adam`` wires a real int8-blockwise-moment AdamW
  (``train/optim.py:adamw_8bit``) — the bitsandbytes-equivalent HBM saving,
  TPU-native;
- GPU-only knobs (``--allow_tf32``, ``--enable_xformers_memory_efficient_attention``,
  ``--local_rank``) are accepted for drop-in script compatibility and logged
  as no-ops (bf16 MXU + Pallas flash attention are always on);
- hub upload flags are accepted but inert (zero-egress deployments).
"""

from __future__ import annotations

import argparse
import logging
import math
import os

import numpy as np

logger = logging.getLogger("agenda_tpu.finetune_sd")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Full SD fine-tuning (TPU).")
    p.add_argument("--input_perturbation", type=float, default=0,
                   help="The scale of input perturbation. Recommended 0.1.")
    p.add_argument("--pretrained_model_name_or_path", type=str, default=None, required=True)
    p.add_argument("--revision", type=str, default=None)
    p.add_argument("--variant", type=str, default=None)
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--validation_prompts", type=str, default=None, nargs="+")
    p.add_argument("--output_dir", type=str, default="sd-model-finetuned")
    p.add_argument("--cache_dir", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--init_resolution", type=int, default=112)
    p.add_argument("--dataset_folder", type=str, default=None)
    p.add_argument("--json_file_name", type=str, default=None)
    p.add_argument("--train_batch_size", type=int, default=16,
                   help="Batch size (per device) for the training dataloader.")
    p.add_argument("--num_train_epochs", type=int, default=100)
    p.add_argument("--max_train_steps", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--snr_gamma", type=float, default=None)
    p.add_argument("--scale_lr", action="store_true", default=False)
    p.add_argument("--lr_scheduler", type=str, default="constant")
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--use_8bit_adam", action="store_true")
    p.add_argument("--allow_tf32", action="store_true")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--offload_ema", action="store_true")
    p.add_argument("--foreach_ema", action="store_true")
    p.add_argument("--non_ema_revision", type=str, default=None)
    p.add_argument("--dataloader_num_workers", type=int, default=0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_weight_decay", type=float, default=1e-2)
    p.add_argument("--adam_epsilon", type=float, default=1e-08)
    p.add_argument("--max_grad_norm", default=1.0, type=float)
    p.add_argument("--push_to_hub", action="store_true")
    p.add_argument("--hub_token", type=str, default=None)
    p.add_argument("--prediction_type", type=str, default=None)
    p.add_argument("--hub_model_id", type=str, default=None)
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--mixed_precision", type=str, default=None, choices=["no", "fp16", "bf16"])
    p.add_argument("--report_to", type=str, default="tensorboard")
    p.add_argument("--local_rank", type=int, default=-1)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--enable_xformers_memory_efficient_attention", action="store_true")
    p.add_argument("--noise_offset", type=float, default=0)
    p.add_argument("--validation_steps", type=int, default=100)
    p.add_argument("--tracker_project_name", type=str, default="text2image-fine-tune")
    # TPU-specific extras
    p.add_argument("--fsdp", type=int, default=1,
                   help="Devices along the parameter-sharding mesh axis (ZeRO-ish).")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="Write a jax.profiler trace of the hot loop here.")
    p.add_argument("--cache_latents", action="store_true", default=True,
                   help="Precompute per-image VAE latent moments once and "
                        "sample them in the step (exact: the data transform "
                        "is deterministic, so only the reparameterized draw "
                        "must stay fresh). Removes the frozen 512px encoder "
                        "from the hot loop. DEFAULT ON since the r5 chip "
                        "measurement: 300.4 -> 244.5 ms/step at bs 4 (-19%, "
                        "16.4 img/s/chip); result bit-identical by test "
                        "(tests/test_latent_cache.py).")
    p.add_argument("--no_cache_latents", dest="cache_latents",
                   action="store_false",
                   help="Re-encode pixels in every step (the reference's "
                        "behavior, data_generation/finetune_sd.py:764-765).")
    args = p.parse_args(argv)

    if args.dataset_folder is None or args.json_file_name is None:
        raise ValueError("Need either a dataset name or a data json file.")
    return args


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from agenda_tpu.core.schedules import make_schedule
    from agenda_tpu.data.datasets import BaseDataset, DataLoader
    from agenda_tpu.data.tokenizer import CLIPTokenizer
    from agenda_tpu.generate.pipeline import StableDiffusionPipeline
    from agenda_tpu.io.diffusers_io import load_pipeline, save_pipeline
    from agenda_tpu.models import AutoencoderKL, CLIPTextModel, UNet2DConditionModel
    from agenda_tpu.parallel.mesh import make_mesh, replicate, shard_batch, shard_params_fsdp
    from agenda_tpu.train.checkpoint import (
        AsyncCheckpointer,
        find_resume_checkpoint,
        load_checkpoint,
    )
    from agenda_tpu.train.finetune_sd import (
        LossConfig,
        TrainState,
        init_train_state,
        make_train_step,
    )
    from agenda_tpu.train.optim import lr_schedule, make_optimizer
    from agenda_tpu.train.trackers import Tracker
    from agenda_tpu.utils.profiling import StepTimer, maybe_profile

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s")
    for flag in ("allow_tf32", "enable_xformers_memory_efficient_attention",
                 "push_to_hub", "offload_ema", "foreach_ema"):
        if getattr(args, flag):
            logger.info("flag --%s accepted for compatibility (no-op on TPU)", flag)
    if args.use_8bit_adam:
        logger.info("--use_8bit_adam: int8-moment AdamW (blockwise absmax; "
                    "fits SD-1.x + EMA on one v5e chip)")

    os.makedirs(args.output_dir, exist_ok=True)
    seed = args.seed if args.seed is not None else 0

    # Models + schedule from the diffusers-layout checkpoint.
    bundle = load_pipeline(args.pretrained_model_name_or_path)
    sc = bundle.scheduler_config or {}
    schedule = make_schedule(
        num_train_timesteps=sc.get("num_train_timesteps", 1000),
        beta_start=sc.get("beta_start", 0.00085),
        beta_end=sc.get("beta_end", 0.012),
        beta_schedule=sc.get("beta_schedule", "scaled_linear"),
        prediction_type=args.prediction_type or sc.get("prediction_type", "epsilon"),
        steps_offset=sc.get("steps_offset", 1),
    )
    compute_dtype = jnp.float32 if args.mixed_precision == "no" else jnp.bfloat16
    # flash_min_dim=40: in training the D=40 latent self-attentions take the
    # Pallas flash fwd+bwd (XLA's backward would materialize f32
    # (B,H,4096,4096) probability tensors — see kernels/attention.py).
    unet = UNet2DConditionModel(bundle.unet_config, dtype=compute_dtype,
                                gradient_checkpointing=args.gradient_checkpointing,
                                flash_min_dim=40)
    vae = AutoencoderKL(bundle.vae_config, dtype=compute_dtype)
    text_encoder = CLIPTextModel(bundle.text_config, dtype=compute_dtype)
    tokenizer = CLIPTokenizer.from_pretrained(bundle.tokenizer_dir)

    # Data
    dataset = BaseDataset(args.dataset_folder, args.json_file_name, args.resolution,
                          tokenizer, device_resize=True)
    if args.max_train_samples:
        dataset.data = dataset.data[: args.max_train_samples]
    resize_w = None
    if dataset.source_size is not None:
        # uniform source tiles: ship uint8, LANCZOS-resize on device
        # (data/device_resize.py — 8.5 ms/img host resize and a 3 MB f32
        # upload become a 37 KB u8 upload + two MXU matmuls in the step)
        from agenda_tpu.data.device_resize import resize_weights

        sw, sh = dataset.source_size
        resize_w = (resize_weights(sh, args.resolution, "lanczos"),
                    resize_weights(sw, args.resolution, "lanczos"))
        logger.info("device resize: %dx%d uint8 tiles -> %d² on chip",
                    sw, sh, args.resolution)

    mesh = make_mesh(dp=-1, fsdp=args.fsdp)
    n_dev = mesh.size
    global_bs = args.train_batch_size * mesh.shape["dp"]
    loader = DataLoader(dataset, global_bs, shuffle=True, seed=seed,
                        num_workers=max(1, args.dataloader_num_workers),
                        pad_to_full=True)

    num_update_steps_per_epoch = math.ceil(len(loader) / args.gradient_accumulation_steps)
    if args.max_train_steps is None:
        args.max_train_steps = args.num_train_epochs * num_update_steps_per_epoch
    args.num_train_epochs = math.ceil(args.max_train_steps / num_update_steps_per_epoch)

    lr = args.learning_rate
    if args.scale_lr:
        lr = lr * args.gradient_accumulation_steps * args.train_batch_size * n_dev
    lr_fn = lr_schedule(args.lr_scheduler, lr, args.lr_warmup_steps * 1,
                        args.max_train_steps * 1)
    # "auto": fused single-pass int8 AdamW (kernels/fused_adamw.py) replaces
    # the optax chain when eligible; AGENDA_TPU_NO_FUSED_ADAMW=1 opts out.
    tx = make_optimizer(lr_fn, args.adam_beta1, args.adam_beta2, args.adam_weight_decay,
                        args.adam_epsilon, args.max_grad_norm,
                        args.gradient_accumulation_steps,
                        use_8bit_adam=args.use_8bit_adam, fused="auto")

    state = init_train_state(bundle.unet_params, tx, args.use_ema)

    initial_step = 0
    if args.resume_from_checkpoint:
        found = find_resume_checkpoint(args.output_dir, args.resume_from_checkpoint)
        if found is None:
            logger.info("Checkpoint '%s' does not exist. Starting a new training run.",
                        args.resume_from_checkpoint)
        else:
            initial_step, path = found
            logger.info("Resuming from checkpoint %s", path)
            state = load_checkpoint(path, state)

    # Placement: frozen params + train state replicated (or fsdp-sharded).
    if args.fsdp > 1:
        state = TrainState(
            params=shard_params_fsdp(state.params, mesh),
            opt_state=jax.tree.map(lambda x: x, state.opt_state),
            step=state.step,
            ema=state.ema,
        )
    else:
        state = replicate(state, mesh)
    cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, compute_dtype), t)
    vae_params = replicate(cast(bundle.vae_params), mesh)
    text_params = replicate(cast(bundle.text_params), mesh)

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
        # Same loader config => identical epoch shuffle stream; only the
        # pixel entry in each row is swapped for its cached moments.
        loader = DataLoader(dataset, global_bs, shuffle=True, seed=seed,
                            num_workers=max(1, args.dataloader_num_workers),
                            pad_to_full=True)

    loss_cfg = LossConfig(
        snr_gamma=args.snr_gamma,
        noise_offset=args.noise_offset,
        input_perturbation=args.input_perturbation,
        prediction_type=args.prediction_type,
    )
    # Donating the TrainState aliases params/opt/EMA buffers in-place — the
    # difference between fitting 512^2 bs-4 (+EMA +int8 moments) on one v5e
    # chip and OOMing by ~4 G (see STATUS "HBM envelope").
    # AGENDA_TPU_NO_DONATE=1 opts out. (Round 2's "axon donated+EMA bug"
    # was root-caused in round 3 to ema_init aliasing the params buffers
    # into the donated state — fixed in core/ema.py; donated EMA steps now
    # run on every backend, verified on the axon chip.)
    donate = () if os.environ.get("AGENDA_TPU_NO_DONATE") == "1" else (0,)
    step_fn = jax.jit(
        make_train_step(unet, vae, text_encoder, schedule, tx, loss_cfg, args.use_ema,
                        gradient_accumulation_steps=args.gradient_accumulation_steps,
                        resize_weights=resize_w),
        donate_argnums=donate,
    )

    tracker = Tracker(os.path.join(args.output_dir, args.logging_dir),
                      args.report_to, config=vars(args))
    rng = jax.random.key(seed)

    logger.info("***** Running training *****")
    logger.info("  Num examples = %d", len(dataset))
    logger.info("  Num Epochs = %d", args.num_train_epochs)
    logger.info("  Per-device batch size = %d (global %d)", args.train_batch_size, global_bs)
    logger.info("  Total optimization steps = %d", args.max_train_steps)
    logger.info("  Mesh = %s", dict(mesh.shape))

    def run_validation(step):
        if not args.validation_prompts:
            return
        # Validation samples from the EMA shadow when enabled — the reference
        # swaps EMA weights in before log_validation and restores after
        # (finetune_sd.py:874-894).
        val_params = (state.ema.params if (args.use_ema and state.ema is not None)
                      else state.params)
        pipe = StableDiffusionPipeline(
            unet=unet, unet_params={"params": val_params},
            vae=vae, vae_params=vae_params,
            text_encoder=text_encoder, text_params=text_params,
            tokenizer=tokenizer, schedule=schedule, scheduler_type="pndm",
            latent_hw=bundle.unet_config.sample_size, dtype=compute_dtype,
        )
        for prompt in args.validation_prompts:
            imgs, _ = pipe(prompt, seeds=list(range(4)), num_inference_steps=20,
                           height=args.resolution, width=args.resolution)
            tracker.log_images(f"validation/{prompt}", imgs, step)

    # global_step counts OPTIMIZER UPDATES, not micro-batches: with
    # --gradient_accumulation_steps N, N micro-batches advance it by 1, and
    # checkpoint/validation/max_train_steps cadences are all gated on it
    # (reference counts sync_gradients steps, finetune_sd.py:761, 830-840).
    global_step = initial_step
    accum = args.gradient_accumulation_steps
    micro_in_step = 0
    timer = StepTimer()
    ckpt_writer = AsyncCheckpointer()
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
                    {**payload, "input_ids": batch["input_ids"]},
                    mesh,
                )
                state, metrics = step_fn(state, vae_params, text_params, batch, rng)
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
                    m["images_per_sec"] = sps * global_bs * accum
                    tracker.log(m, global_step)
                    logger.info("step %d: loss=%.5f (%.2f img/s)", global_step,
                                m["loss"], m["images_per_sec"])
                if global_step % args.checkpointing_steps == 0:
                    ckpt_writer.save(args.output_dir, global_step,
                                     bundle.unet_config, state,
                                     args.checkpoints_total_limit)
                    logger.info("Saving state to %s/checkpoint-%d (async)",
                                args.output_dir, global_step)
                if args.validation_prompts and global_step % args.validation_steps == 0:
                    run_validation(global_step)
                if global_step >= args.max_train_steps:
                    done = True
                    break

    ckpt_writer.wait()  # surface any pending checkpoint-write error
    # Final export: full diffusers pipeline (finetune_sd.py:896-911).
    final_params = state.ema.params if (args.use_ema and state.ema is not None) else state.params
    save_pipeline(
        args.output_dir,
        bundle.unet_config,
        {"params": jax.device_get(final_params)},
        bundle.vae_config,
        bundle.vae_params,
        bundle.text_config,
        bundle.text_params,
        tokenizer_dir=bundle.tokenizer_dir,
        scheduler_config=bundle.scheduler_config,
    )
    logger.info("Saved pipeline to %s", args.output_dir)
    tracker.close()


if __name__ == "__main__":
    main()
