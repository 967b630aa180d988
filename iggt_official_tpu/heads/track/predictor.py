"""Iterative track refinement predictor.

Behavioural parity: `iggt/heads/track_modules/base_track_predictor.py`
(`BaseTrackerPredictor`): init tracks at the query points, then per
iteration — correlation-pyramid lookup -> corr MLP + flow sincos embedding
+ track features -> EfficientUpdateFormer -> coordinate/feature deltas,
with frame-0 coordinates pinned to the queries; sigmoid visibility and
confidence heads on the final track features.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.config import TrackHeadConfig
from iggt_official_tpu.heads.track.corr import build_pyramid, corr_sample
from iggt_official_tpu.heads.track.modules import EfficientUpdateFormer
from iggt_official_tpu.heads.track.sampling import (
    bilinear_sample_nhwc,
    get_2d_embedding,
    get_2d_sincos_pos_embed,
)
from iggt_official_tpu.layers.blocks import Mlp, gelu_exact


class BaseTrackerPredictor(nn.Module):
    """fmaps (B, S, H', W', C) + queries (B, N, 2) -> track refinements."""

    cfg: TrackHeadConfig
    stride: int = 2
    depth: int = 6
    max_scale: int = 518

    @nn.compact
    def __call__(
        self,
        query_points: jax.Array,
        fmaps: jax.Array,
        iters: Optional[int] = None,
    ) -> Tuple[List[jax.Array], jax.Array, Optional[jax.Array]]:
        cfg = self.cfg
        iters = iters or cfg.iters
        latent = cfg.features
        B, N, _ = query_points.shape
        B, S, HH, WW, C = fmaps.shape

        fmaps = nn.LayerNorm(epsilon=1e-5, name="fmap_norm")(fmaps)
        query_points = query_points / float(self.stride)

        coords = jnp.tile(query_points[:, None], (1, S, 1, 1))  # (B, S, N, 2)
        query_track_feat = bilinear_sample_nhwc(fmaps[:, 0], coords[:, 0])
        track_feats = jnp.tile(query_track_feat[:, None], (1, S, 1, 1))
        coords0 = coords

        pyramid, pyr_scales = build_pyramid(fmaps, cfg.corr_levels)

        corr_mlp = Mlp(
            hidden_features=cfg.hidden_size,
            out_features=latent,
            name="corr_mlp",
        )
        transformer_dim = 3 * latent + 4
        updateformer = EfficientUpdateFormer(
            space_depth=self.depth,
            time_depth=self.depth,
            hidden_size=cfg.hidden_size,
            output_dim=latent + 2,
            name="updateformer",
        )
        query_ref_token = self.param(
            "query_ref_token", nn.initializers.normal(1.0),
            (1, 2, transformer_dim),
        )
        ffeat_norm = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="ffeat_norm")
        ffeat_updater = nn.Dense(latent, name="ffeat_updater")
        vis_predictor = nn.Dense(1, name="vis_predictor")
        conf_predictor = (
            nn.Dense(1, name="conf_predictor") if cfg.predict_conf else None
        )

        pos_grid = get_2d_sincos_pos_embed(transformer_dim, (HH, WW))
        pos_grid = jnp.broadcast_to(pos_grid, (B, HH, WW, transformer_dim))

        coord_preds: List[jax.Array] = []
        for _ in range(iters):
            coords = jax.lax.stop_gradient(coords)

            fcorrs = corr_sample(pyramid, pyr_scales, track_feats,
                                 coords, cfg.corr_radius)
            corr_dim = fcorrs.shape[-1]
            fcorrs_ = jnp.swapaxes(fcorrs, 1, 2).reshape(B * N, S, corr_dim)
            fcorrs_ = corr_mlp(fcorrs_)

            flows = coords - coords[:, 0:1]
            flows_ = jnp.swapaxes(flows, 1, 2).reshape(B * N, S, 2)
            flows_emb = get_2d_embedding(flows_, latent // 2)
            flows_emb = jnp.concatenate(
                [flows_emb, flows_ / self.max_scale, flows_ / self.max_scale],
                axis=-1,
            )

            track_feats_ = jnp.swapaxes(track_feats, 1, 2).reshape(
                B * N, S, latent
            )
            x = jnp.concatenate([flows_emb, fcorrs_, track_feats_], axis=-1)

            sampled_pos = bilinear_sample_nhwc(pos_grid, coords[:, 0])
            sampled_pos = sampled_pos.reshape(B * N, 1, transformer_dim)
            x = x + sampled_pos

            qr = jnp.concatenate(
                [
                    query_ref_token[:, 0:1],
                    jnp.broadcast_to(
                        query_ref_token[:, 1:2], (1, S - 1, transformer_dim)
                    ),
                ],
                axis=1,
            )
            x = x + qr

            delta = updateformer(x.reshape(B, N, S, transformer_dim))
            delta = delta.reshape(B * N, S, latent + 2)
            delta_coords = delta[..., :2]
            delta_feats = delta[..., 2:].reshape(B * N * S, latent)

            tf_flat = track_feats_.reshape(B * N * S, latent)
            tf_flat = gelu_exact(ffeat_updater(ffeat_norm(delta_feats))) + tf_flat
            track_feats = jnp.swapaxes(
                tf_flat.reshape(B, N, S, latent), 1, 2
            )

            coords = coords + jnp.swapaxes(
                delta_coords.reshape(B, N, S, 2), 1, 2
            )
            coords = coords.at[:, 0].set(coords0[:, 0])
            coord_preds.append(coords * self.stride)

        tf = track_feats.reshape(B * S * N, latent)
        vis = jax.nn.sigmoid(vis_predictor(tf)).reshape(B, S, N)
        conf = None
        if conf_predictor is not None:
            conf = jax.nn.sigmoid(conf_predictor(tf)).reshape(B, S, N)
        return coord_preds, vis, conf
