from agenda_tpu.io.diffusers_io import (
    load_pipeline,
    save_pipeline,
    load_unet,
    load_vae,
    load_text_encoder,
    PipelineBundle,
)
from agenda_tpu.io.learned_embeds import load_learned_embeddings, save_learned_embeddings

__all__ = [
    "load_pipeline",
    "save_pipeline",
    "load_unet",
    "load_vae",
    "load_text_encoder",
    "PipelineBundle",
    "load_learned_embeddings",
    "save_learned_embeddings",
]
