"""Calibration harness for the generation-half quality gate (VERDICT r4 #1).

Runs the mini-AGenDA loop in phases against a persistent workdir so each
piece can be iterated on and measured separately before the calibrated
floors land in tests/test_generation_quality.py:

    python scripts/calibrate_mini_agenda.py setup   --workdir /tmp/mini
    python scripts/calibrate_mini_agenda.py train   --workdir /tmp/mini --sd-steps 2000
    python scripts/calibrate_mini_agenda.py gen     --workdir /tmp/mini --guidance 3

setup: procedural source set (tests/mini_agenda_data.py) + tiny pipeline
       with a domain-pretrained VAE.
train: full-SD fine-tune through the production CLI (cli/finetune_sd.py).
gen:   sample with fused DAAM heatmaps, recover car GT from the redness
       invariant, report generation quality + heatmap localization metrics.

What the reference claims and we gate: the per-word DAAM heatmaps of a
*trained* SD localize the named objects (data_generation/README.md:34-66);
pseudo-label P/R through the chain (docs/index.html table 2).
"""

import argparse
import json
import os
import sys

# Hard override: the image pins JAX_PLATFORMS=axon for every process; the
# mini-AGenDA calibration runs on CPU like the gate test it feeds.
os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# sitecustomize pins the axon backend at interpreter start; jax.config wins
# as long as no device has been touched yet (tests/conftest.py:13-17).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402


def log(msg):
    print(msg, flush=True)


def phase_setup(args):
    from mini_agenda_data import build_mini_sd_pipeline, make_aerial_set

    ds = os.path.join(args.workdir, "src")
    os.makedirs(ds, exist_ok=True)
    make_aerial_set(ds, args.n_train, domain="source", seed=0)
    imgs = np.stack([
        np.asarray(Image.open(os.path.join(ds, "images", f"{i}.png")))
        for i in range(args.n_train)])
    info = build_mini_sd_pipeline(
        os.path.join(args.workdir, "pipe"), imgs,
        resolution=args.resolution, vae_steps=args.vae_steps, seed=0,
        log_fn=log)
    log(json.dumps(info))

    # VAE round-trip sanity: the redness invariant must survive decode(encode)
    import jax
    import jax.numpy as jnp

    from agenda_tpu.io.diffusers_io import load_pipeline
    from agenda_tpu.models import AutoencoderKL

    bundle = load_pipeline(os.path.join(args.workdir, "pipe"))
    vae = AutoencoderKL(bundle.vae_config)
    small = np.stack([
        np.asarray(Image.fromarray(im).resize(
            (args.resolution, args.resolution), Image.LANCZOS))
        for im in imgs[:8]])
    px = jnp.asarray(small.astype(np.float32) / 127.5 - 1.0)
    recon, *_ = jax.jit(vae.apply)(bundle.vae_params, px, jax.random.key(0))
    recon_u8 = np.clip((np.asarray(recon) + 1) * 127.5, 0, 255).astype(np.uint8)
    from mini_agenda_data import find_generated_cars

    n_src = sum(len(find_generated_cars(im, min_area=10)) for im in small)
    n_rec = sum(len(find_generated_cars(im, min_area=10)) for im in recon_u8)
    log(f"vae roundtrip: cars in source {n_src} -> recon {n_rec}")
    Image.fromarray(np.concatenate(
        [np.concatenate(list(small[:4]), axis=1),
         np.concatenate(list(recon_u8[:4]), axis=1)], axis=0)).save(
        os.path.join(args.workdir, "vae_roundtrip.png"))


def phase_train(args):
    from agenda_tpu.cli import finetune_sd

    finetune_sd.main([
        "--pretrained_model_name_or_path", os.path.join(args.workdir, "pipe"),
        "--dataset_folder", os.path.join(args.workdir, "src"),
        "--json_file_name", "data.json",
        "--output_dir", os.path.join(args.workdir, "sd"),
        "--resolution", str(args.resolution),
        "--train_batch_size", str(args.bs),
        "--max_train_steps", str(args.sd_steps),
        "--learning_rate", str(args.lr),
        "--lr_warmup_steps", "100",
        "--checkpointing_steps", "100000",
        "--seed", "0",
    ] + (["--cache_latents"] if args.cache_latents else []))


def phase_gen(args):
    import jax.numpy as jnp

    from agenda_tpu.generate.pipeline import StableDiffusionPipeline
    from mini_agenda_data import find_generated_cars, heatmap_mass_in_boxes

    model_dir = args.model_dir or os.path.join(args.workdir, "sd")
    pipe = StableDiffusionPipeline.from_pretrained(model_dir, dtype=jnp.float32)
    prompt = "an aerial view image with cars in linz"
    out_dir = os.path.join(args.workdir, "gen")
    os.makedirs(out_dir, exist_ok=True)

    imgs, word_maps = pipe(
        prompt, seeds=list(range(args.n_gen)),
        num_inference_steps=args.steps, guidance_scale=args.guidance,
        words=["cars"], height=args.resolution, width=args.resolution,
        out_size=112)
    cars_maps = word_maps["cars"]  # (B, latent_hw, latent_hw) u8

    n_with, concs, bases, counts = 0, [], [], []
    for i in range(len(imgs)):
        cars = find_generated_cars(imgs[i])
        counts.append(len(cars))
        heat = np.asarray(Image.fromarray(cars_maps[i]).resize(
            (112, 112), Image.BILINEAR), np.float32)
        if cars:
            n_with += 1
            frac, base = heatmap_mass_in_boxes(heat, cars)
            concs.append(frac)
            bases.append(base)
        Image.fromarray(imgs[i]).save(os.path.join(out_dir, f"{i}.png"))
        Image.fromarray(cars_maps[i]).resize((112, 112)).save(
            os.path.join(out_dir, f"{i}_heat.png"))

    # conditioning control: the no-cars prompt should generate few/no cars
    imgs_nc, _ = pipe("an aerial view image in linz",
                      seeds=list(range(args.n_gen)),
                      num_inference_steps=args.steps,
                      guidance_scale=args.guidance,
                      height=args.resolution, width=args.resolution,
                      out_size=112)
    counts_nc = [len(find_generated_cars(im)) for im in imgs_nc]
    for i in range(min(8, len(imgs_nc))):
        Image.fromarray(imgs_nc[i]).save(os.path.join(out_dir, f"nc_{i}.png"))

    res = {
        "n_gen": args.n_gen,
        "frac_with_cars": n_with / args.n_gen,
        "mean_cars": float(np.mean(counts)),
        "mean_cars_nocars_prompt": float(np.mean(counts_nc)),
        "heat_conc_mean": float(np.mean(concs)) if concs else None,
        "heat_conc_min": float(np.min(concs)) if concs else None,
        "area_baseline_mean": float(np.mean(bases)) if bases else None,
        "lift_mean": float(np.mean(np.array(concs) / np.maximum(np.array(bases), 1e-9)))
        if concs else None,
        "guidance": args.guidance,
    }
    log(json.dumps(res))
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("phase", choices=["setup", "train", "gen"])
    p.add_argument("--workdir", default="/tmp/mini_agenda")
    p.add_argument("--n-train", type=int, default=96)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--vae-steps", type=int, default=500)
    p.add_argument("--sd-steps", type=int, default=2000)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--cache-latents", action="store_true")
    p.add_argument("--n-gen", type=int, default=16)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--guidance", type=float, default=3.0)
    p.add_argument("--model-dir", default=None)
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    {"setup": phase_setup, "train": phase_train, "gen": phase_gen}[args.phase](args)


if __name__ == "__main__":
    main()
