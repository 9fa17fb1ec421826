"""ResNet-50 in flax (NHWC), torchvision-compatible structure.

Used by the label refiner as the binary crop classifier
(``data_annotation/refine_label.py:326-328``: torchvision resnet50 with the
fc head replaced by ``num_classes`` logits). Module/parameter names mirror
torchvision's state-dict layout (conv1/bn1/layer{1-4}.{i}.conv{1-3}/
downsample.{0,1}/fc) so ImageNet weights convert mechanically when supplied
(zero-egress environments train from scratch; see io.resnet_import).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride), padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = norm("bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_0")(x)
            identity = norm("downsample_1")(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    num_classes: int = 1
    dtype: jnp.dtype = jnp.float32
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        """Classifier logits, or (C2, C3, C4, C5) pyramid when features=True."""
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        planes = 64
        feats = []
        for li, n_blocks in enumerate(self.stage_sizes):
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                x = Bottleneck(
                    planes,
                    stride=stride,
                    downsample=(bi == 0),
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)
            planes *= 2
            feats.append(x)
        if features:
            return tuple(feats)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def normalize_imagenet(x01: jax.Array) -> jax.Array:
    """[0,1] RGB -> ImageNet-normalized (refine_label.py:289-299 transforms)."""
    return (x01 - IMAGENET_MEAN) / IMAGENET_STD
