from agenda_tpu.models.unet import UNet2DConditionModel, UNetConfig
from agenda_tpu.models.vae import AutoencoderKL, VAEConfig
from agenda_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig

__all__ = [
    "UNet2DConditionModel",
    "UNetConfig",
    "AutoencoderKL",
    "VAEConfig",
    "CLIPTextModel",
    "CLIPTextConfig",
]
