"""agenda_tpu — TPU-native (JAX/XLA/Pallas) framework with the capabilities of AGenDA.

AGenDA (ICCV 2025) is a two-stage synthetic-data pipeline for cross-domain aerial
vehicle detection: Stable-Diffusion fine-tuning with learnable domain/foreground/
background tokens and cross-attention (DAAM) heatmap supervision, followed by a
detector-bootstrapping pseudo-label chain.

This package is a ground-up TPU-first redesign, not a port:

- ``core``      diffusion schedules (DDPM train / DDIM / PNDM sample), min-SNR
                loss weights, EMA — pure functions on pytrees.
- ``kernels``   Pallas TPU kernels: flash attention; a cross-attention variant
                that emits per-token probability heatmaps as a fused side
                output (replaces the reference's Python attention hooks,
                ``data_generation/hook.py``).
- ``models``    flax modules: CLIP text encoder (with ``inputs_embeds``
                injection), AutoencoderKL VAE, SD UNet2DCondition, ResNet-50
                crop classifier, detectors. NHWC layout throughout.
- ``io``        HF-diffusers checkpoint import/export, learned-embeddings
                ``.bin`` compat, orbax train state, COCO JSON (bit-compatible
                with the reference's file formats).
- ``data``      pure-Python image/prompt loaders feeding jnp (BaseDataset /
                TokenDataset equivalents), token merge-index computation.
- ``train``     pjit/shard_map training steps on a device mesh (DP + optional
                FSDP axis) for finetune_sd and finetune_sd_token.
- ``generate``  sharded batched sampling with fused DAAM heatmaps;
                heatmap stacking postprocess.
- ``annotate``  pseudo-annotation builders, edge-completion box math,
                F1-max threshold selection, label refinement, evaluators.
- ``parallel``  mesh construction and sharding helpers.
- ``cli``       argparse entry points mirroring the reference scripts' flags.
"""

__version__ = "0.1.0"
