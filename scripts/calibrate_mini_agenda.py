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
# AGENDA_CALIB_TPU=1 keeps the attached chip instead — the tiny-SD steps run
# ~50x faster there, so hyperparameter iteration happens on-chip and the
# final CPU gate run just confirms the floors on the CI platform.
_USE_TPU = bool(int(os.environ.get("AGENDA_CALIB_TPU", "0")))
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

# sitecustomize pins the axon backend at interpreter start; jax.config wins
# as long as no device has been touched yet (tests/conftest.py:13-17).
import jax  # noqa: E402

if not _USE_TPU:
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


def phase_setupb(args):
    """Domain-PAIR setup: src + tgt + combined train folder, pipeline with
    the VAE pretrained on BOTH domains (the reference fine-tunes one SD on
    LINZ+UGRC together — data_generation/README.md:5-11)."""
    from mini_agenda_data import build_mini_sd_pipeline, make_domain_pair

    src, tgt, comb = make_domain_pair(args.workdir, args.n_train,
                                      args.n_train, seed=args.domain_seed)
    prompts = json.load(open(os.path.join(comb, "data.json")))
    imgs = np.stack([
        np.asarray(Image.open(os.path.join(comb, rel)))
        for rel in sorted(prompts)])
    info = build_mini_sd_pipeline(
        os.path.join(args.workdir, "pipe"), imgs,
        resolution=args.resolution, vae_steps=args.vae_steps, seed=0,
        log_fn=log)
    log(json.dumps(info))


def phase_train(args):
    from agenda_tpu.cli import finetune_sd

    data_dir = os.path.join(args.workdir, "combined")
    if not os.path.isdir(data_dir):
        data_dir = os.path.join(args.workdir, "src")
    start = args.model_dir or os.path.join(args.workdir, "pipe")
    finetune_sd.main([
        "--pretrained_model_name_or_path", start,
        "--dataset_folder", data_dir,
        "--json_file_name", "data.json",
        "--output_dir", os.path.join(args.workdir, "sd"),
        "--resolution", str(args.resolution),
        "--train_batch_size", str(args.bs),
        "--max_train_steps", str(args.sd_steps),
        "--learning_rate", str(args.lr),
        "--lr_warmup_steps", "100",
        "--snr_gamma", "5",      # finetune_sd.sh:11
        "--checkpointing_steps", "100000",
        "--seed", "0",
        # finetune_sd defaults cache_latents ON — pass the explicit opt-out
        # when the harness flag is unset so "uncached" really measures the
        # uncached path
        "--cache_latents" if args.cache_latents else "--no_cache_latents",
    ])


TOKEN_INIT = ["cars", "linz", "utah"]   # -> new_token_v0 (fg), v1, v2 (bgs)


def phase_token1(args):
    """Stage 1: learn fg+bg tokens with attention regularization
    (finetune_sd_token.sh: --train_token --train_unet --with_cross_attn_reg,
    initialize_token = object word + one bg word per domain)."""
    from agenda_tpu.cli import finetune_sd_token

    finetune_sd_token.main([
        "--pretrained_model_name_or_path", os.path.join(args.workdir, "sd"),
        "--dataset_folder", os.path.join(args.workdir, "combined"),
        "--json_file_name", "data.json",
        "--output_dir", os.path.join(args.workdir, "tok1"),
        "--resolution", str(args.resolution),
        "--train_batch_size", str(args.bs),
        "--max_train_steps", str(args.tok_steps),
        "--learning_rate", str(args.tok_lr),
        "--checkpointing_steps", str(args.tok_steps),
        "--object_token", "new_token",
        "--n_object_embedding", "1",
        "--initialize_token", *TOKEN_INIT,
        "--reg_weight", "0.5",
        "--train_token", "--train_unet", "--with_cross_attn_reg",
        "--seed", "0",
    ])


def phase_token2(args):
    """Stage 2: freeze learned embeddings, fine-tune the UNet
    (finetune_sd_token_stage2.sh)."""
    from agenda_tpu.cli import finetune_sd_token

    emb = os.path.join(args.workdir, "tok1",
                       f"learned_embeds_steps_{args.tok_steps}.bin")
    if not os.path.exists(emb):
        emb = os.path.join(args.workdir, "tok1", "learned_embeds.bin")
    finetune_sd_token.main([
        "--pretrained_model_name_or_path", os.path.join(args.workdir, "sd"),
        "--dataset_folder", os.path.join(args.workdir, "combined"),
        "--json_file_name", "data.json",
        "--output_dir", os.path.join(args.workdir, "tok2"),
        "--resolution", str(args.resolution),
        "--train_batch_size", str(args.bs),
        "--max_train_steps", str(args.tok2_steps),
        "--learning_rate", str(args.tok_lr),
        "--checkpointing_steps", str(args.tok2_steps),
        "--object_token", "new_token",
        "--n_object_embedding", "1",
        "--initialize_token", *TOKEN_INIT,
        "--reg_weight", "0.5",
        "--embedding_path", emb,
        "--train_unet", "--with_cross_attn_reg",
        "--seed", "0",
    ])


def _styles(args):
    """(name, prompt, bg_token_dir, with_cars) — the three reference
    campaigns (data_generation/README.md:34-66): source-style with cars,
    target-style with cars, target-style WITHOUT cars (the no-cars campaign
    doubles as the conditioning control: a model that ignores the prompt
    renders cars here too)."""
    return [
        ("gen_src", "an aerial view image with {} cars in {} linz",
         "daam_new_token_v1_heatmaps", True),
        ("gen_tgt", "an aerial view image with {} cars in {} utah",
         "daam_new_token_v2_heatmaps", True),
        ("gen_tgt_empty", "an aerial view image in {} utah",
         "daam_new_token_v2_heatmaps", False),
    ]


def phase_gentok(args):
    """Token-stage generation through the production CLIs: images + DAAM
    heatmaps for the object word and each learnable token, then the RGB
    stacking postprocessor, then extraction-GT COCO from the redness
    invariant."""
    from agenda_tpu.cli import data_generation, postprocess_heatmap
    from mini_agenda_data import extraction_coco

    model_dir = args.model_dir or _latest_full_model(
        os.path.join(args.workdir, "tok2"))
    emb = os.path.join(args.workdir, "tok1",
                       f"learned_embeds_steps_{args.tok_steps}.bin")
    for name, prompt, bg_dir, with_cars in _styles(args):
        out = os.path.join(args.workdir, name)
        heat_flags = (["--word_token_heatmaps", "cars",
                       "--store_learnable_token_heatmaps"] if with_cars
                      else [])  # the no-cars campaign stores images only
        data_generation.main([
            "--pretrained-model-path", model_dir,
            "--learnable-tokens-embedding-path", emb,
            "--initialize_token", *TOKEN_INIT,
            "--prompt", prompt,
            *heat_flags,
            "--save-dir", out,
            "--num-images", str(args.n_gen),
            "--image-size", "112",
            "--resolution", str(args.resolution),
            "--num-inference-steps", str(args.steps),
            "--guidance-scale", str(args.guidance),
            "--batch-size", "8",
        ])
        if with_cars:
            postprocess_heatmap.main([
                "--save-dir", out,
                "--object-heatmap-path", "daam_cars_heatmaps",
                "--fg-heatmap-path", "daam_new_token_v0_heatmaps",
                "--bg-heatmap-path", bg_dir,
                "--stack-heatmap-save-path", "daam_stack_heatmaps",
                "--inv-heatmap-save-path", bg_dir.replace("_heatmaps",
                                                          "_inv_heatmaps"),
            ])
        # min_area 300: between the distractor-disc band (<= ~154 px² drawn,
        # <= ~250 after generative blur) and the car band (>= ~575 drawn,
        # >= ~350 generated) — the GT must not count rendered discs as cars.
        n = extraction_coco(os.path.join(out, "images"),
                            os.path.join(out, "ann.json"), n=args.n_gen,
                            min_area=300)
        log(f"{name}: extraction GT boxes = {n} over {args.n_gen} images")


def _latest_full_model(out_dir):
    import glob as _glob

    cands = sorted(_glob.glob(os.path.join(out_dir, "full_model_step_*")),
                   key=lambda p: int(p.rsplit("_", 1)[1]))
    if cands:
        return cands[-1]
    return out_dir


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


def phase_score(args):
    """Gate (a): object-word DAAM heatmap mass must concentrate on the
    rendered car locations of the GENERATED images (the claim of
    data_generation/README.md:34-66), measured as lift over the
    uniform-area baseline."""
    from mini_agenda_data import find_generated_cars, heatmap_mass_in_boxes

    out = {}
    for name, _, _, with_cars in _styles(args):
        root = os.path.join(args.workdir, name)
        if not os.path.isdir(root):
            continue
        concs, bases, counts = [], [], []
        for i in range(args.n_gen):
            img = np.asarray(Image.open(
                os.path.join(root, "images", f"{i}.png")).convert("RGB"))
            cars = find_generated_cars(img, min_area=300)
            counts.append(len(cars))
            if with_cars and cars:
                heat = np.asarray(Image.open(
                    os.path.join(root, "daam_cars_heatmaps",
                                 f"{i}.png")).convert("L"), np.float32)
                frac, base = heatmap_mass_in_boxes(heat, cars)
                concs.append(frac), bases.append(base)
        lift = (np.array(concs) / np.maximum(np.array(bases), 1e-9)
                if concs else np.array([0.0]))
        out[name] = {
            "mean_cars": float(np.mean(counts)),
            "frac_with_cars": float(np.mean(np.array(counts) > 0)),
            "heat_conc_mean": float(np.mean(concs)) if concs else None,
            "lift_mean": float(lift.mean()),
            "lift_min": float(lift.min()),
        }
    log(json.dumps(out))
    return out


def _coco_split(root, train_frac=0.75):
    """Split extraction-GT ann.json into ann_train/ann_val by image index."""
    coco = json.load(open(os.path.join(root, "ann.json")))
    ids = [im["id"] for im in coco["images"]]
    cut = int(len(ids) * train_frac)
    tr_ids, va_ids = set(ids[:cut]), set(ids[cut:])
    for name, keep in (("ann_train.json", tr_ids), ("ann_val.json", va_ids)):
        sub = {"categories": coco["categories"],
               "images": [im for im in coco["images"] if im["id"] in keep],
               "annotations": [a for a in coco["annotations"]
                               if a["image_id"] in keep]}
        with open(os.path.join(root, name), "w") as f:
            json.dump(sub, f)


def phase_chain(args):
    """Gate (b): the REAL generated heatmap stacks through the production
    annotation chain — stack-detector train on gen_src, F1-max threshold on
    held-out gen_src, pseudo-COCO on gen_tgt, refine — scored against the
    extraction GT (the roles of data_annotation/README.md:8-61)."""
    import pickle

    from agenda_tpu.annotate.coco import evaluate_pseudo_annotations, load_coco
    from agenda_tpu.cli import refine_label, select_threshold
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    src = os.path.join(args.workdir, "gen_src")
    tgt = os.path.join(args.workdir, "gen_tgt")
    _coco_split(src)

    train_ds = CocoDetDataset(src, "ann_train.json", "daam_stack_heatmaps/",
                              img_scale=(64, 64), max_gt=8, train=True)
    val_ds = CocoDetDataset(src, "ann_val.json", "daam_stack_heatmaps/",
                            img_scale=(64, 64), max_gt=8, train=False)
    tgt_ds = CocoDetDataset(tgt, "ann.json", "daam_stack_heatmaps/",
                            img_scale=(64, 64), max_gt=8, train=False)

    fam = build_family("yolov8", model=dict(img_size=64, max_gt=8))
    cfg = RunnerConfig(output_dir=os.path.join(args.workdir, "chain_work"),
                       max_epochs=args.det_epochs, batch_size=2, lr=0.01,
                       val_interval=1000, warmup_iters=20, log_interval=100,
                       lr_milestones=(0.7,))
    runner = DetectorRunner(fam, cfg)
    variables = runner.train(train_ds)
    src_map = runner.evaluate(variables, val_ds)

    val_pkl = os.path.join(args.workdir, "chain_val.pkl")
    tgt_pkl = os.path.join(args.workdir, "chain_tgt.pkl")
    runner.test(variables, val_ds, out_pkl=val_pkl)
    runner.test(variables, tgt_ds, out_pkl=tgt_pkl)

    res = select_threshold.main(["--prediction_pkl", val_pkl])
    thr = res["threshold"]
    select_threshold.main(["--prediction_pkl", tgt_pkl, "--emit-pseudo-coco",
                           "--thresh-conf", str(thr),
                           "--out-dir", args.workdir])
    import glob as _glob

    pseudo_path = max(_glob.glob(os.path.join(
        args.workdir, "annotations_coco_FakeBBoxes*.json")),
        key=os.path.getmtime)
    gt = load_coco(os.path.join(tgt, "ann.json"))
    p_, r_ = evaluate_pseudo_annotations(gt, load_coco(pseudo_path))
    f1 = 2 * p_ * r_ / max(p_ + r_, 1e-9)

    refined_path = os.path.join(args.workdir, "chain_refined.json")
    refine_label.main([
        "--prediction_pkl", tgt_pkl,
        "--synthetic_image_base_path", os.path.join(tgt, "images"),
        "--json_save_path", refined_path,
        "--checkpoint_save_path", os.path.join(args.workdir, "chain_clf"),
        "--num_epochs", "16", "--train_batch_size", "16",
        "--test_batch_size", "32", "--crop_size", "64", "--seed", "0",
        "--lr", "3e-3",
    ])
    rp, rr = evaluate_pseudo_annotations(gt, load_coco(refined_path))
    rf1 = 2 * rp * rr / max(rp + rr, 1e-9)
    out = {"src_val_map50": float(src_map["bbox_mAP_50"]),
           "threshold": float(thr), "ap": float(res["ap"]),
           "pseudo_p": p_, "pseudo_r": r_, "pseudo_f1": f1,
           "refined_p": rp, "refined_r": rr, "refined_f1": rf1,
           "pseudo_path": pseudo_path, "refined_path": refined_path}
    log(json.dumps(out))
    return out


def phase_margin(args):
    """The paper's bottom line on the mini pair: a detector trained on
    REAL SOURCE RGB degrades on the shifted target; a detector trained on
    SYNTHETIC TARGET RGB with chain pseudo-labels recovers it
    (docs/index.html table 1 role)."""
    from agenda_tpu.detect.dataset import CocoDetDataset
    from agenda_tpu.detect.families import build_family
    from agenda_tpu.detect.runner import DetectorRunner, RunnerConfig

    def train_eval(root, ann, prefix, tag):
        train_ds = CocoDetDataset(root, ann, prefix, img_scale=(64, 64),
                                  max_gt=8, train=True)
        real_tgt = CocoDetDataset(os.path.join(args.workdir, "tgt"),
                                  "ann.json", "images/", img_scale=(64, 64),
                                  max_gt=8, train=False)
        fam = build_family("yolov8", model=dict(img_size=64, max_gt=8))
        cfg = RunnerConfig(
            output_dir=os.path.join(args.workdir, f"margin_{tag}"),
            max_epochs=args.det_epochs, batch_size=2, lr=0.01,
            val_interval=1000, warmup_iters=20, log_interval=100,
            lr_milestones=(0.7,))
        runner = DetectorRunner(fam, cfg)
        variables = runner.train(train_ds)
        return runner.evaluate(variables, real_tgt)

    src_only = train_eval(os.path.join(args.workdir, "src"), "ann.json",
                          "images/", "srconly")
    refined = os.path.join(args.workdir, "chain_refined.json")
    import shutil

    tgt_gen = os.path.join(args.workdir, "gen_tgt")
    shutil.copyfile(refined, os.path.join(tgt_gen, "refined.json"))
    agenda = train_eval(tgt_gen, "refined.json", "images/", "agenda")
    out = {"source_only_map50": float(src_only["bbox_mAP_50"]),
           "agenda_map50": float(agenda["bbox_mAP_50"])}
    log(json.dumps(out))
    return out


def phase_full(args):
    """Whole loop in ONE process: on the tunneled axon backend each new
    client can wait out a multi-minute backend lease before its first op
    runs (STATUS round-5 wedge notes), so phase-per-process chaining pays
    that once per phase. One process = one lease."""
    for name, fn in [("setupb", phase_setupb), ("train", phase_train),
                     ("token1", phase_token1), ("token2", phase_token2),
                     ("gentok", phase_gentok), ("score", phase_score),
                     ("chain", phase_chain), ("margin", phase_margin)]:
        log(f"=== phase {name} ===")
        fn(args)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("phase", choices=["setup", "setupb", "train", "token1",
                                     "token2", "gen", "gentok", "score",
                                     "chain", "margin", "full"])
    p.add_argument("--workdir", default="/tmp/mini_agenda")
    p.add_argument("--domain-seed", type=int, default=0,
                   help="procedural domain-pair seed (floor-robustness runs)")
    p.add_argument("--n-train", type=int, default=96)
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--vae-steps", type=int, default=500)
    p.add_argument("--sd-steps", type=int, default=2000)
    p.add_argument("--tok-steps", type=int, default=1000)
    p.add_argument("--tok2-steps", type=int, default=500)
    p.add_argument("--tok-lr", type=float, default=5e-4)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--cache-latents", action="store_true")
    p.add_argument("--n-gen", type=int, default=16)
    p.add_argument("--det-epochs", type=int, default=30)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--guidance", type=float, default=3.0)
    p.add_argument("--model-dir", default=None)
    args = p.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    {"setup": phase_setup, "setupb": phase_setupb, "train": phase_train,
     "token1": phase_token1, "token2": phase_token2, "gen": phase_gen,
     "gentok": phase_gentok, "score": phase_score, "chain": phase_chain,
     "margin": phase_margin, "full": phase_full}[args.phase](args)


if __name__ == "__main__":
    main()
