"""Chip-measured SD train-step benchmark + xprof harness (VERDICT r3 #4).

Reproduces the production full-SD fine-tune step at reference geometry with
fabricated weights (throughput is weight-independent): full SD-1.x UNet,
512x512, bf16 compute / f32 master, fused int8-moment AdamW + EMA, donated
state, device-side 112->512 LANCZOS resize of uint8 source tiles — the exact
step `agenda_tpu.cli.finetune_sd` runs with scripts/finetune_sd.sh's flags
(reference recipe: data_generation/finetune_sd.sh:5-11).

Prints sustained ms/step + img/s/chip; with --profile-dir captures a
jax.profiler trace of the steady state and prints the per-op device report
(utils/xprof.py) used to chase the conv layout-copy floor.

    python scripts/bench_train.py --bs 4 --steps 30
    python scripts/bench_train.py --bs 4 --profile-dir /tmp/tr_trace
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=4, help="per-chip batch size")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--no-donate", action="store_true")
    p.add_argument("--flash-min-dim", type=int, default=40)
    p.add_argument("--source-size", type=int, default=112,
                   help="uint8 source tile edge (device-resized to 512)")
    p.add_argument("--cache-latents", action="store_true",
                   help="feed cached latent moments instead of pixels "
                        "(--cache_latents production path: no VAE encode "
                        "in the step)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--profile-dir", default=None)
    p.add_argument("--profile-steps", type=int, default=6)
    p.add_argument("--top", type=int, default=25, help="ops in the report")
    p.add_argument("--tiny", action="store_true",
                   help="tiny UNet on CPU — harness smoke test only")
    args = p.parse_args(argv)
    if args.tiny:
        os.environ["JAX_PLATFORMS"] = "cpu"

    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from agenda_tpu.core.schedules import make_schedule
    from agenda_tpu.data.device_resize import resize_weights
    from agenda_tpu.models import (
        AutoencoderKL,
        CLIPTextConfig,
        CLIPTextModel,
        UNet2DConditionModel,
        UNetConfig,
        VAEConfig,
    )
    from agenda_tpu.train.finetune_sd import (
        LossConfig,
        init_train_state,
        make_train_step,
    )
    from agenda_tpu.train.optim import lr_schedule, make_optimizer

    dtype = jnp.bfloat16
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        unet_cfg = UNetConfig.tiny()
        vae_cfg = VAEConfig.tiny()
        text_cfg = CLIPTextConfig.tiny()
        args.resolution, args.source_size = 64, 16
    else:
        unet_cfg, vae_cfg, text_cfg = UNetConfig(), VAEConfig(), CLIPTextConfig()
    unet = UNet2DConditionModel(unet_cfg, dtype=dtype,
                                gradient_checkpointing=args.remat,
                                flash_min_dim=args.flash_min_dim)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    text_encoder = CLIPTextModel(text_cfg, dtype=dtype)
    schedule = make_schedule(prediction_type="epsilon")

    def fab(shapes, seed):
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        rng = np.random.RandomState(seed)
        return jax.tree_util.tree_unflatten(
            treedef,
            [rng.normal(0, 0.02, l.shape).astype(np.float32) for l in leaves])

    lat = args.resolution // 8
    unet_params = fab(jax.eval_shape(lambda: unet.init(
        jax.random.key(0), jnp.zeros((1, lat, lat, 4), jnp.float32),
        jnp.array([1]), jnp.zeros((1, 77, unet_cfg.cross_attention_dim), jnp.float32))), 1)
    vae_params = fab(jax.eval_shape(lambda: vae.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        jax.random.key(0))), 2)
    text_params = fab(jax.eval_shape(lambda: text_encoder.init(
        jax.random.key(0), jnp.ones((1, 77), jnp.int32))), 3)

    lr_fn = lr_schedule("constant", 1e-6, 0, 100000)
    tx = make_optimizer(lr_fn, 0.9, 0.999, 1e-2, 1e-8, max_grad_norm=1.0,
                        gradient_accumulation_steps=1, use_8bit_adam=True,
                        fused="auto")
    state = init_train_state(unet_params, tx, use_ema=not args.no_ema)
    cast = lambda t: jax.tree.map(lambda x: jnp.asarray(x, dtype), t)
    vae_params = cast(vae_params)
    text_params = cast(text_params)

    rw = (resize_weights(args.source_size, args.resolution, "lanczos"),
          resize_weights(args.source_size, args.resolution, "lanczos"))
    loss_cfg = LossConfig(snr_gamma=5.0)
    donate = () if args.no_donate else (0,)
    step_fn = jax.jit(
        make_train_step(unet, vae, text_encoder, schedule, tx, loss_cfg,
                        use_ema=not args.no_ema, resize_weights=rw),
        donate_argnums=donate,
    )

    rng = jax.random.key(0)
    host = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(host.randint(
            0, text_cfg.vocab_size, (args.bs, 77), np.int32)),
    }
    if args.cache_latents:
        batch["latent_moments"] = jnp.asarray(host.normal(
            0, 1, (args.bs, lat, lat, 8)).astype(np.float32))
    else:
        batch["pixel_u8"] = jnp.asarray(host.randint(
            0, 256, (args.bs, args.source_size, args.source_size, 3), np.uint8))

    print(f"# compiling train step (bs {args.bs}) ...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    compiled = step_fn.lower(state, vae_params, text_params, batch, rng).compile()
    print(f"# compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(args.warmup):
        state, metrics = compiled(state, vae_params, text_params, batch, rng)
    jax.block_until_ready(metrics["loss"])
    print(f"# warmup ({args.warmup} steps): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    step_fn = compiled

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, vae_params, text_params, batch, rng)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"train step: {dt * 1e3:.1f} ms/step sustained  "
          f"{args.bs / dt:.2f} img/s/chip  (bs {args.bs}, "
          f"{'remat' if args.remat else 'no-remat'}, "
          f"{'ema' if not args.no_ema else 'no-ema'}, "
          f"{'donated' if not args.no_donate else 'undonated'}"
          f"{', cached-latents' if args.cache_latents else ''})")

    if args.profile_dir:
        from agenda_tpu.utils import xprof
        from agenda_tpu.utils.profiling import maybe_profile

        with maybe_profile(args.profile_dir):
            for _ in range(args.profile_steps):
                state, metrics = step_fn(state, vae_params, text_params,
                                         batch, rng)
            jax.block_until_ready(metrics["loss"])
        rep = xprof.device_op_report(args.profile_dir,
                                     iters=args.profile_steps, top=args.top)
        print(xprof.format_report(rep))


if __name__ == "__main__":
    main()
