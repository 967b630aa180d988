"""Token-pyramid projectors feeding the instance (part) head.

Behavioural parity: `iggt/heads/adaptor.py:9-226`.
- ``Projects``: 1x1 conv+BN+ReLU -> residual double 3x3 conv+BN block -> 1x1.
- ``GeoProjector``: tokens of 4 intermediate layers -> LayerNorm -> 1x1
  projection -> DPT-style resize pyramid {res2..res5} (4x, 2x, 1x, 0.5x).
- ``SamProjector``: same front-end but richer resize stacks with Projects
  refinements -> {res1..res4}.

TPU design notes: NHWC; BatchNorm is inference-form (running stats as
parameters) since the reference ships inference only.  The reference also
returns ``PositionEmbeddingSine`` maps which `IGGT.forward` never consumes
(`iggt/models/vggt.py:208-213`), so they are omitted here; the sine
embedding lives with the SAM2 stack where it is actually used.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.ops.conv import Conv2d, ConvTranspose2d, FrozenBatchNorm


class Projects(nn.Module):
    """Residual conv refinement block (`adaptor.py:9-35`)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        x = Conv2d(self.features, 1, use_bias=False, dtype=dt,
                   name="input_proj_conv")(x)
        x = FrozenBatchNorm(self.features, name="input_proj_bn")(x)
        x = nn.relu(x)
        res = x
        x = Conv2d(self.features, 3, padding=1, use_bias=False, dtype=dt,
                   name="res_conv1")(x)
        x = FrozenBatchNorm(self.features, name="res_bn1")(x)
        x = nn.relu(x)
        x = Conv2d(self.features, 3, padding=1, use_bias=False, dtype=dt,
                   name="res_conv2")(x)
        x = FrozenBatchNorm(self.features, name="res_bn2")(x)
        x = x + res
        return Conv2d(self.features, 1, dtype=dt, name="output_proj")(x)


def _project_tokens(
    tokens: jax.Array,
    patch_start_idx: int,
    grid_hw: Tuple[int, int],
    norm: nn.Module,
    proj: nn.Module,
) -> jax.Array:
    """(B, S, P, C) tokens -> NHWC patch map through LayerNorm + 1x1 conv."""
    x = tokens[:, :, patch_start_idx:]
    B, S = x.shape[0], x.shape[1]
    ph, pw = grid_hw
    x = x.reshape(B * S, ph * pw, x.shape[-1]).astype(jnp.float32)
    x = norm(x)
    x = x.reshape(B * S, ph, pw, x.shape[-1])
    return proj(x)


class GeoProjector(nn.Module):
    """4-level {res2..res5} pyramid (`adaptor.py:38-138`)."""

    dim_in: int
    patch_size: int = 14
    pos_embed: bool = False
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    out_channels: Tuple[int, ...] = (256, 256, 256, 256)

    @nn.compact
    def __call__(
        self,
        aggregated_tokens_list: Sequence[jax.Array],
        images_hw: Tuple[int, int],
        patch_start_idx: int,
    ) -> Dict[str, jax.Array]:
        H, W = images_hw
        ph, pw = H // self.patch_size, W // self.patch_size
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")

        out: Dict[str, jax.Array] = {}
        keys = ["res2", "res3", "res4", "res5"]
        for i, (layer_idx, key) in enumerate(zip(self.intermediate_layer_idx, keys)):
            x = _project_tokens(
                aggregated_tokens_list[layer_idx],
                patch_start_idx,
                (ph, pw),
                norm,
                Conv2d(self.out_channels[i], 1, name=f"projects_{i}"),
            )
            if i == 0:
                x = ConvTranspose2d(
                    self.out_channels[i], 4, stride=4, name=f"resize_{i}"
                )(x)
            elif i == 1:
                x = ConvTranspose2d(
                    self.out_channels[i], 2, stride=2, name=f"resize_{i}"
                )(x)
            elif i == 3:
                x = Conv2d(
                    self.out_channels[i], 3, stride=2, padding=1, name=f"resize_{i}"
                )(x)
            out[key] = x
        return out


class SamProjector(nn.Module):
    """4-level {res1..res4} pyramid with Projects refinements
    (`adaptor.py:140-226`).  Returns NHWC maps with batch dim B*S at
    4x / 2x / 1x / 0.5x the patch-grid resolution."""

    dim_in: int
    patch_size: int = 14
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    out_channels: Tuple[int, ...] = (256, 256, 256, 256)
    # optional construction-time statics (for nn.scan over view chunks)
    images_hw: Optional[Tuple[int, int]] = None
    patch_start_idx: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        aggregated_tokens_list: Sequence[jax.Array],
        images_hw: Optional[Tuple[int, int]] = None,
        patch_start_idx: Optional[int] = None,
    ) -> List[jax.Array]:
        images_hw = images_hw if images_hw is not None else self.images_hw
        if patch_start_idx is None:
            patch_start_idx = self.patch_start_idx
        H, W = images_hw
        ph, pw = H // self.patch_size, W // self.patch_size
        norm = nn.LayerNorm(epsilon=1e-5, name="norm")

        out: List[jax.Array] = []
        for i, layer_idx in enumerate(self.intermediate_layer_idx):
            oc = self.out_channels[i]
            dt = self.dtype
            x = _project_tokens(
                aggregated_tokens_list[layer_idx],
                patch_start_idx,
                (ph, pw),
                norm,
                Conv2d(oc, 1, dtype=dt, name=f"projects_{i}"),
            )
            if i == 0:
                # two exact 2x upsamples, each refined (`adaptor.py:154-159`)
                x = ConvTranspose2d(oc, 4, stride=2, padding=1, dtype=dt,
                                    name="resize_0_up1")(x)
                x = Projects(oc, dtype=dt, name="resize_0_proj1")(x)
                x = ConvTranspose2d(oc, 4, stride=2, padding=1, dtype=dt,
                                    name="resize_0_up2")(x)
                x = Projects(oc, dtype=dt, name="resize_0_proj2")(x)
            elif i == 1:
                x = ConvTranspose2d(oc, 2, stride=2, dtype=dt,
                                    name="resize_1_up")(x)
                x = Projects(oc, dtype=dt, name="resize_1_proj")(x)
            elif i == 2:
                x = Projects(oc, dtype=dt, name="resize_2_proj")(x)
            else:
                x = Conv2d(oc, 3, stride=2, padding=1, dtype=dt,
                           name="resize_3_down")(x)
                x = Projects(oc, dtype=dt, name="resize_3_proj")(x)
            out.append(x)
        return out
