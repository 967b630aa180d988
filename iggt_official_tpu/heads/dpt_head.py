"""DPT dense-prediction head (depth / world-points / tracker features).

Behavioural parity: `iggt/heads/dpt_head.py:21-509`:
tokens of 4 intermediate aggregator layers -> LayerNorm -> 1x1 projection ->
(optional UV sincos pos-embed x0.1) -> per-level resize (4x, 2x, 1x, 0.5x)
-> RefineNet fusion pyramid -> upsample to full resolution -> output convs
-> value/confidence split with per-head activations.

TPU design notes:
- Everything is NHWC; convs map straight onto XLA's fused conv pipeline.
- The reference chunks frames (``frames_chunk_size=12``) to bound CUDA
  memory (`dpt_head.py:154-190`); here the (B*S) batch dim is already the
  conv batch and XLA tiles it, so no host-side chunking is needed.  For
  very long sequences the caller can `lax.map` over view chunks instead.
- The reference's INT_MAX-chunked interpolate (`dpt_head.py:484-509`) is
  unnecessary: our resize is two 1-D gathers, tiled by XLA.
- The whole head runs fp32, mirroring the autocast-disabled region
  (`iggt/models/vggt.py:189`).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.config import DPTConfig
from iggt_official_tpu.heads.act import activate_head
from iggt_official_tpu.heads.embeds import create_uv_grid, position_grid_to_embed
from iggt_official_tpu.ops.conv import Conv2d, ConvTranspose2d
from iggt_official_tpu.ops.interpolate import bilinear_resize_align_corners


def apply_uv_pos_embed(
    x: jax.Array, img_w: int, img_h: int, ratio: float = 0.1
) -> jax.Array:
    """Add a scaled UV sincos embedding to an NHWC map (`dpt_head.py:274-284`)."""
    H, W, C = x.shape[-3], x.shape[-2], x.shape[-1]
    grid = create_uv_grid(W, H, aspect_ratio=img_w / img_h, dtype=jnp.float32)
    emb = position_grid_to_embed(grid, C) * ratio
    return x + emb.astype(x.dtype)


class ResidualConvUnit(nn.Module):
    """relu->conv3x3->relu->conv3x3 + skip (`dpt_head.py:369-411`).

    NB: the reference's ``nn.ReLU(inplace=True)`` mutates the unit's input
    (`dpt_head.py:401`), so its skip connection effectively adds the
    *activated* input: out = conv2(relu(conv1(relu(x)))) + relu(x).  We
    reproduce that semantic explicitly.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        a = nn.relu(x)
        out = Conv2d(self.features, 3, padding=1, dtype=self.dtype,
                     name="conv1")(a)
        out = nn.relu(out)
        out = Conv2d(self.features, 3, padding=1, dtype=self.dtype,
                     name="conv2")(out)
        return out + a


class FeatureFusionBlock(nn.Module):
    """RefineNet fusion step (`dpt_head.py:414-481`).

    out = out_conv(resize(resConfUnit2(x [+ resConfUnit1(res)]), size))
    """

    features: int
    has_residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        residual: Optional[jax.Array] = None,
        size: Optional[Tuple[int, int]] = None,
    ) -> jax.Array:
        if self.has_residual:
            assert residual is not None
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="resConfUnit1")(residual)
        x = ResidualConvUnit(self.features, dtype=self.dtype,
                             name="resConfUnit2")(x)
        if size is None:
            size = (2 * x.shape[-3], 2 * x.shape[-2])
        x = bilinear_resize_align_corners(x, size)
        return Conv2d(self.features, 1, dtype=self.dtype, name="out_conv")(x)


class DPTHead(nn.Module):
    """Aggregated tokens (list of (B, S, P, C)) -> dense NHWC predictions.

    Returns, depending on config (matching `dpt_head.py:130-272`):
    - default: ``(preds (B,S,H',W',out-1), conf (B,S,H',W'))``
    - ``for_tracker``: feature maps ``(B,S,H',W',features)``
    - ``use_point_feat``: ``(preds, conf, (out2, out3, out4))`` pyramid feats.
    H' = H // down_ratio.
    """

    cfg: DPTConfig
    # static geometry may be fixed at construction instead of call time so
    # the head can be nn.scan'ed over view chunks (scan passes arrays only)
    images_hw: Optional[Tuple[int, int]] = None
    patch_start_idx: Optional[int] = None
    # compute dtype of the decode path.  float32 is the reference's
    # autocast-disabled island (`iggt/models/vggt.py:189`) and is enforced
    # regardless of the parameter storage dtype; bfloat16 is the documented
    # fast mode (ModelConfig.head_dtype).  Activations always run fp32.
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        aggregated_tokens_list: Sequence[jax.Array],
        images_hw: Optional[Tuple[int, int]] = None,
        patch_start_idx: Optional[int] = None,
    ):
        cfg = self.cfg
        images_hw = images_hw if images_hw is not None else self.images_hw
        if patch_start_idx is None:
            patch_start_idx = self.patch_start_idx
        H, W = images_hw
        p = cfg.patch_size
        ph, pw = H // p, W // p

        norm = nn.LayerNorm(epsilon=1e-5, name="norm")

        # Per-level token projection + resize (`dpt_head.py:222-244`)
        resize_specs = ["up4", "up2", "id", "down2"]
        levels: List[jax.Array] = []
        for i, layer_idx in enumerate(cfg.intermediate_layer_idx):
            x = aggregated_tokens_list[layer_idx][:, :, patch_start_idx:]
            B, S = x.shape[0], x.shape[1]
            x = x.reshape(B * S, ph * pw, x.shape[-1]).astype(jnp.float32)
            x = norm(x).astype(self.dtype)
            x = x.reshape(B * S, ph, pw, x.shape[-1])
            x = Conv2d(cfg.out_channels[i], 1, dtype=self.dtype,
                       name=f"projects_{i}")(x)
            if cfg.pos_embed:
                x = apply_uv_pos_embed(x, W, H)
            kind = resize_specs[i]
            if kind == "up4":
                x = ConvTranspose2d(
                    cfg.out_channels[i], 4, stride=4, dtype=self.dtype,
                    name=f"resize_{i}"
                )(x)
            elif kind == "up2":
                x = ConvTranspose2d(
                    cfg.out_channels[i], 2, stride=2, dtype=self.dtype,
                    name=f"resize_{i}"
                )(x)
            elif kind == "down2":
                x = Conv2d(
                    cfg.out_channels[i], 3, stride=2, padding=1,
                    dtype=self.dtype, name=f"resize_{i}"
                )(x)
            levels.append(x)

        # Scratch 3x3 projections into the shared fusion width
        rn = [
            Conv2d(cfg.features, 3, padding=1, use_bias=False,
                   dtype=self.dtype, name=f"layer{i+1}_rn")(levels[i])
            for i in range(4)
        ]

        # RefineNet fusion top-down (`dpt_head.py:286-316`)
        out4 = FeatureFusionBlock(cfg.features, has_residual=False,
                                  dtype=self.dtype, name="refinenet4")(
            rn[3], size=rn[2].shape[-3:-1]
        )
        out3 = FeatureFusionBlock(cfg.features, dtype=self.dtype,
                                  name="refinenet3")(
            out4, rn[2], size=rn[1].shape[-3:-1]
        )
        out2 = FeatureFusionBlock(cfg.features, dtype=self.dtype,
                                  name="refinenet2")(
            out3, rn[1], size=rn[0].shape[-3:-1]
        )
        out1 = FeatureFusionBlock(cfg.features, dtype=self.dtype,
                                  name="refinenet1")(out2, rn[0])

        if cfg.for_tracker:
            out = Conv2d(cfg.features, 3, padding=1, dtype=self.dtype,
                         name="output_conv1")(out1)
        else:
            out = Conv2d(cfg.features // 2, 3, padding=1, dtype=self.dtype,
                         name="output_conv1")(out1)

        out_hw = (ph * p // cfg.down_ratio, pw * p // cfg.down_ratio)
        out = bilinear_resize_align_corners(out, out_hw)
        if cfg.pos_embed:
            out = apply_uv_pos_embed(out, W, H)

        if cfg.for_tracker:
            return out.reshape(B, S, *out.shape[1:])

        out = Conv2d(32, 3, padding=1, dtype=self.dtype,
                     name="output_conv2_0")(out)
        out = nn.relu(out)
        out = Conv2d(cfg.output_dim, 1, dtype=self.dtype,
                     name="output_conv2_2")(out)

        # value/conf activations (exp etc.) always in fp32
        preds, conf = activate_head(
            out.astype(jnp.float32), activation=cfg.activation,
            conf_activation=cfg.conf_activation
        )
        preds = preds.reshape(B, S, *preds.shape[1:])
        conf = conf.reshape(B, S, *conf.shape[1:])
        if cfg.use_point_feat:
            # pyramid stays at batch B*S — the Part head consumes it per-frame
            # (`part_head.py:168-197` operates on B*S maps)
            return preds, conf, (out2, out3, out4)
        return preds, conf
