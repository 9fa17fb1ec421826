from agenda_tpu.generate.pipeline import StableDiffusionPipeline

__all__ = ["StableDiffusionPipeline"]
