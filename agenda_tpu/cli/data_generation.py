"""CLI: batched image + DAAM-heatmap generation.

Flag-compatible with the reference ``data_generation/data_generation.py:11-23``
(same flags, same output tree: ``images/<seed>.png`` and
``daam_<word>_heatmaps/<seed>.png``), plus TPU extras:

- ``--batch-size``: the reference generates one image per python-loop
  iteration; here seeds are batched through one compiled sampler (and shard
  across a device mesh when more than one chip is attached).
- ``--num-inference-steps`` / ``--guidance-scale``: exposed instead of being
  hardcoded (reference uses 20 steps / pipeline-default 7.5).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Image and attention map generation.")
    p.add_argument("--save-dir", type=str, default="Data/Synthetic",
                   help="Directory to save images (and heatmaps if enabled).")
    p.add_argument("--pretrained-model-path", type=str,
                   default="output/LINZ-Utah/sd1.4-token-finetune-stage-two/full_model_step_4500",
                   help="Path of the pretrained pipeline to load (diffusers layout).")
    p.add_argument("--learnable-tokens-embedding-path", type=str,
                   default="output/LINZ-Utah/sd1.4-token-finetune-stage-one/learned_embeds_steps_9000.bin",
                   help="Path to the learned token embeddings (.bin).")
    p.add_argument("--prompt", type=str,
                   default="An aerial view image with {} cars in {} Utah",
                   help="Prompt template for image generation.")
    p.add_argument("--initialize_token", type=str, nargs="+",
                   default=["cars", "Utah", "New Zealand"],
                   help="The initialization words for learnable tokens (stage one order).")
    p.add_argument("--word_token_heatmaps", type=str, default=None, nargs="+",
                   help="word tokens to compute DAAM heatmaps.")
    p.add_argument("--store_learnable_token_heatmaps", action="store_true",
                   help="Whether to store DAAM heatmaps for learnable tokens.")
    p.add_argument("--num-images", type=int, default=10000, help="Number of images to generate.")
    p.add_argument("--image-size", type=int, default=112, help="Size of the generated images.")
    p.add_argument("--start-seed", type=int, default=0, help="First seed (resume support).")
    p.add_argument("--batch-size", type=int, default=8, help="Seeds per compiled batch per device.")
    p.add_argument("--num-inference-steps", type=int, default=20)
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--resolution", type=int, default=512, help="Sampling resolution before resize.")
    p.add_argument("--tgate-step", type=int, default=0,
                   help="TGATE fast sampling (arXiv:2404.02747): freeze cross-"
                        "attention at this step and run the rest CFG-collapsed "
                        "at half batch. APPROXIMATE (changes images and DAAM "
                        "heatmaps) — off (0) by default; 0 keeps the exact "
                        "reference-parity sampler.")
    return p.parse_args(argv)


def main(argv=None):
    from PIL import Image

    from agenda_tpu.generate.pipeline import StableDiffusionPipeline
    from agenda_tpu.io.learned_embeds import load_learned_embeddings
    from agenda_tpu.utils.profiling import progress

    args = parse_args(argv)
    os.makedirs(args.save_dir, exist_ok=True)

    pipeline = StableDiffusionPipeline.from_pretrained(args.pretrained_model_path)

    # Shard the seed batch across all attached chips (dp mesh); --batch-size
    # stays per-device, like the trainers.
    import jax

    if len(jax.devices()) > 1:
        from agenda_tpu.parallel.mesh import make_mesh

        pipeline.mesh = make_mesh()
        args.batch_size = args.batch_size * pipeline.mesh.shape["dp"]

    embeds_dict = load_learned_embeddings(args.learnable_tokens_embedding_path)
    all_new_tokens = list(embeds_dict.keys())

    all_word_token_heatmaps = list(args.word_token_heatmaps or [])
    new_tokens = []
    for t, n in zip(args.initialize_token, all_new_tokens):
        if t in args.prompt:
            if args.store_learnable_token_heatmaps:
                all_word_token_heatmaps.append(n)
            new_tokens.append(n)

    pipeline.add_learned_tokens({t: embeds_dict[t] for t in new_tokens})
    prompt = args.prompt.format(*new_tokens)

    img_dir = os.path.join(args.save_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    for word in all_word_token_heatmaps:
        os.makedirs(os.path.join(args.save_dir, f"daam_{word}_heatmaps"), exist_ok=True)

    words = all_word_token_heatmaps or None
    seeds = list(range(args.start_seed, args.start_seed + args.num_images))

    def dispatch(batch_seeds):
        # Keep a static batch shape for the compiled sampler: pad the tail.
        padded = batch_seeds + [batch_seeds[-1]] * (args.batch_size - len(batch_seeds))
        # Per-word heatmaps come back as normalized uint8 computed on device
        # (minimal host transfer; identical math to the reference's
        # normalize->uint8 at data_generation.py:80-84).
        return pipeline.generate_async(
            prompt,
            padded,
            num_inference_steps=args.num_inference_steps,
            guidance_scale=args.guidance_scale,
            height=args.resolution,
            width=args.resolution,
            words=words,
            out_size=args.image_size,
            tgate_step=args.tgate_step,
        )

    def write(batch_seeds, result):
        images, word_maps = result()
        for j, seed in enumerate(batch_seeds):
            if images[j].max() < 1:
                # All-black output guard (reference NSFW-filter skip,
                # data_generation.py:61-62).
                continue
            Image.fromarray(images[j]).save(os.path.join(img_dir, f"{seed}.png"))
            for word in all_word_token_heatmaps:
                arr = Image.fromarray(word_maps[word][j]).resize(
                    (args.image_size, args.image_size)
                )
                arr.save(
                    os.path.join(args.save_dir, f"daam_{word}_heatmaps", f"{seed}.png")
                )

    # One batch in flight: while the device samples batch i+1, the host
    # encodes/writes batch i's PNGs (the device would otherwise idle for the
    # full PNG-encode time every batch).
    pending = None
    for i in progress(range(0, len(seeds), args.batch_size), desc="generate"):
        batch_seeds = seeds[i : i + args.batch_size]
        result = dispatch(batch_seeds)
        if pending is not None:
            write(*pending)
        pending = (batch_seeds, result)
    if pending is not None:
        write(*pending)


if __name__ == "__main__":
    main()
