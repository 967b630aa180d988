"""Instance-grounded part-feature head.

Behavioural parity: `iggt/heads/part_head.py:14-243`:
- Inputs: the SamProjector pyramid [res1(4x), res2(2x), res3(1x), res4(0.5x)]
  and the point head's fusion pyramid (out2(4x), out3(2x), out4(1x)).
- RefineNet fusion with cross-attention injections of point features after
  refinenet4 (level 1x, `part_head.py:168-173`) and refinenet3 (level 2x,
  `:178-183`), an overlapping-window cross-attention (SwinCA) after
  refinenet2 (level 4x, `:188-197`), then refinenet1, output_conv1, a
  window self-attention (SwinSA, `:222-225`), bilinear upsample to full
  resolution and the 2-conv output stack.
- Output: raw 8-channel feature maps (B, S, H, W, 8) — NO activation and no
  confidence channel (`part_head.py:240-243`); the app path L2-normalizes.

Reference quirks: PartHead inherits DPTHead's token projection layers but
never calls them (its ``_forward_impl`` consumes projector features
directly, `part_head.py:206-218`) — those dead parameters are not
replicated here.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.config import PartHeadConfig
from iggt_official_tpu.heads.dpt_head import FeatureFusionBlock
from iggt_official_tpu.heads.window_attn import SwinCA, SwinSA
from iggt_official_tpu.layers.blocks import CrossAttention
from iggt_official_tpu.ops.conv import Conv2d
from iggt_official_tpu.ops.interpolate import bilinear_resize_align_corners


class PartHead(nn.Module):
    """Fuse projector + point features into per-pixel instance embeddings."""

    cfg: PartHeadConfig
    # optional construction-time statics (for nn.scan over view chunks)
    images_hw: Optional[Tuple[int, int]] = None
    batch_dims: Optional[Tuple[int, int]] = None
    # fp32 mirrors the reference's autocast-disabled island and is enforced
    # regardless of parameter storage; bfloat16 is the documented fast mode
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        projector_features: Sequence[jax.Array],
        point_features: Sequence[jax.Array],
        images_hw: Optional[Tuple[int, int]] = None,
        batch_dims: Optional[Tuple[int, int]] = None,
    ) -> jax.Array:
        """projector_features: 4 NHWC maps with batch B*S (res1..res4);
        point_features: 3 NHWC maps with batch B*S (out2, out3, out4).
        Returns (B, S, H', W', output_dim) raw features."""
        cfg = self.cfg
        images_hw = images_hw if images_hw is not None else self.images_hw
        batch_dims = batch_dims if batch_dims is not None else self.batch_dims
        B, S = batch_dims
        H, W = images_hw
        p = cfg.patch_size
        ph, pw = H // p, W // p
        feats = cfg.features

        def flat(x):  # NHWC -> (N, HW, C)
            return x.reshape(x.shape[0], -1, x.shape[-1])

        dt = self.dtype
        rn = [
            Conv2d(feats, 3, padding=1, use_bias=False, dtype=dt,
                   name=f"layer{i+1}_rn")(projector_features[i].astype(dt))
            for i in range(4)
        ]
        pt2, pt3, pt4 = [t.astype(dt) for t in point_features]

        out = FeatureFusionBlock(feats, has_residual=False, dtype=dt,
                                 name="refinenet4")(
            rn[3], size=rn[2].shape[-3:-1]
        )
        # cross-attention injection, level 1x (`part_head.py:168-173`)
        out = CrossAttention(feats, cfg.ca_num_heads, dtype=dt,
                             name="cross_attention_2")(
            flat(out), flat(pt4), flat(pt4)
        ).reshape(out.shape)

        out = FeatureFusionBlock(feats, dtype=dt, name="refinenet3")(
            out, rn[2], size=rn[1].shape[-3:-1]
        )
        # Reference quirk (`part_head.py:178-185`): cross_attention_1's
        # output `out3` is computed but NEVER consumed — refinenet2 takes
        # `out` (the refinenet3 result), unlike level 1x where `out4` is
        # wired in.  We call the module so its parameters exist for the
        # checkpoint converter and discard the result (XLA dead-code
        # eliminates the compute under jit).
        _unused_out3 = CrossAttention(feats, cfg.ca_num_heads, dtype=dt,
                                      name="cross_attention_1")(
            flat(out), flat(pt3), flat(pt3)
        )
        del _unused_out3

        out = FeatureFusionBlock(feats, dtype=dt, name="refinenet2")(
            out, rn[1], size=rn[0].shape[-3:-1]
        )
        # overlapping-window cross-attention, level 4x (`part_head.py:188-197`)
        out = SwinCA(
            embed_dim=feats,
            out_chans=feats,
            num_heads=cfg.swin_num_heads,
            window_size=cfg.window_size,
            q_window_mode=cfg.q_window_mode,
            dtype=dt,
            name="window_cross_attention",
        )(out, pt2, pt2)

        out = FeatureFusionBlock(feats, dtype=dt, name="refinenet1")(out, rn[0])
        out = Conv2d(feats // 2, 3, padding=1, dtype=dt,
                     name="output_conv1")(out)

        # window self-attention on the fused map (`part_head.py:222-225`)
        out = SwinSA(
            embed_dim=feats // 2,
            out_chans=feats // 2,
            num_heads=cfg.swin_num_heads,
            window_size=cfg.window_size,
            dtype=dt,
            name="window_self_atten",
        )(out)

        out = bilinear_resize_align_corners(out, (ph * p, pw * p))
        out = Conv2d(32, 3, padding=1, dtype=dt, name="output_conv2_0")(out)
        out = nn.relu(out)
        out = Conv2d(cfg.output_dim, 1, dtype=dt, name="output_conv2_2")(out)
        return out.astype(jnp.float32).reshape(B, S, *out.shape[1:])
