"""SAM prompt encoder, two-way transformer, mask decoder.

Behavioural parity:
- `PromptEncoder` (`sam2/modeling/sam/prompt_encoder.py:11-199`): random
  Fourier point/box embeddings with per-label type embeddings, mask
  downscaling conv stack, dense no-mask embedding.
- `TwoWayTransformer` / `TwoWayAttentionBlock` / `Attention`
  (`sam2/modeling/sam/transformer.py:13-244`): sparse<->dense two-way
  attention with projection downsampling; post-norm residuals.
- `MaskDecoder` (`sam2/modeling/sam/mask_decoder.py:9-289`): output tokens
  (obj-score + iou + 4 mask tokens), transformer, high-res-feature
  upscaling, hypernetwork mask heads, iou + object-score heads, dynamic
  multimask-via-stability fallback.

All dense maps NHWC.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.ops.conv import Conv2d, ConvTranspose2d
from iggt_official_tpu.sam2.common import MLP, LayerNorm2d


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier position encoding (`position_encoding.py:127-170`)."""

    num_pos_feats: int = 64

    @nn.compact
    def __call__(self, coords01: jax.Array) -> jax.Array:
        """coords01 in [0, 1], (..., 2) -> (..., 2*num_pos_feats)."""
        gauss = self.param(
            "positional_encoding_gaussian_matrix",
            nn.initializers.normal(1.0),
            (2, self.num_pos_feats),
        )
        c = 2 * coords01.astype(jnp.float32) - 1
        c = c @ gauss
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    def grid(self, h: int, w: int) -> jax.Array:
        """(h, w, C) dense grid embedding (`position_encoding.py:150-161`)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(
            [jnp.broadcast_to(xs[None, :], (h, w)),
             jnp.broadcast_to(ys[:, None], (h, w))],
            axis=-1,
        )
        return self(grid)


class PromptEncoder(nn.Module):
    embed_dim: int
    image_embedding_size: Tuple[int, int]
    input_image_size: Tuple[int, int]
    mask_in_chans: int

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(
            self.embed_dim // 2, name="pe_layer"
        )
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0),
            (4, self.embed_dim),
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        c4 = self.mask_in_chans // 4
        self.mask_conv1 = Conv2d(c4, 2, stride=2, name="mask_conv1")
        self.mask_ln1 = LayerNorm2d(c4, name="mask_ln1")
        self.mask_conv2 = Conv2d(self.mask_in_chans, 2, stride=2,
                                 name="mask_conv2")
        self.mask_ln2 = LayerNorm2d(self.mask_in_chans, name="mask_ln2")
        self.mask_conv3 = Conv2d(self.embed_dim, 1, name="mask_conv3")

    def get_dense_pe(self) -> jax.Array:
        h, w = self.image_embedding_size
        return self.pe_layer.grid(h, w)  # (h, w, C)

    def _embed_points(self, points, labels, pad: bool) -> jax.Array:
        points = points + 0.5
        if pad:
            B = points.shape[0]
            points = jnp.concatenate(
                [points, jnp.zeros((B, 1, 2), points.dtype)], axis=1
            )
            labels = jnp.concatenate(
                [labels, -jnp.ones((B, 1), labels.dtype)], axis=1
            )
        H, W = self.input_image_size
        norm = points / jnp.asarray([W, H], jnp.float32)
        emb = self.pe_layer(norm)
        emb = jnp.where(
            (labels == -1)[..., None],
            jnp.zeros_like(emb) + self.not_a_point_embed,
            emb,
        )
        for lbl in range(4):
            emb = jnp.where(
                (labels == lbl)[..., None],
                emb + self.point_embeddings[lbl],
                emb,
            )
        return emb

    def _embed_boxes(self, boxes) -> jax.Array:
        boxes = boxes + 0.5
        coords = boxes.reshape(-1, 2, 2)
        H, W = self.input_image_size
        emb = self.pe_layer(coords / jnp.asarray([W, H], jnp.float32))
        emb = emb.at[:, 0].add(self.point_embeddings[2])
        emb = emb.at[:, 1].add(self.point_embeddings[3])
        return emb

    def _embed_masks(self, masks) -> jax.Array:
        """masks (B, 4h, 4w, 1) NHWC -> (B, h, w, C)."""
        x = self.mask_conv1(masks)
        x = nn.gelu(self.mask_ln1(x))
        x = self.mask_conv2(x)
        x = nn.gelu(self.mask_ln2(x))
        return self.mask_conv3(x)

    def __call__(self, points=None, boxes=None, masks=None):
        if points is not None:
            bs = points[0].shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1

        sparse = jnp.zeros((bs, 0, self.embed_dim), jnp.float32)
        if points is not None:
            coords, labels = points
            sparse = jnp.concatenate(
                [sparse, self._embed_points(coords, labels, pad=boxes is None)],
                axis=1,
            )
        if boxes is not None:
            sparse = jnp.concatenate(
                [sparse, self._embed_boxes(boxes)], axis=1
            )
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed[None, None, None], (bs, h, w, self.embed_dim)
            )
        return sparse, dense


class DownsampleAttention(nn.Module):
    """SAM attention with projection downsampling
    (`sam/transformer.py:184-244`)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    kv_in_dim: Optional[int] = None

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        hd = internal // self.num_heads
        qp = nn.Dense(internal, name="q_proj")(q)
        kp = nn.Dense(internal, name="k_proj")(k)
        vp = nn.Dense(internal, name="v_proj")(v)
        B, Nq = qp.shape[:2]
        qh = qp.reshape(B, Nq, self.num_heads, hd)
        kh = kp.reshape(B, -1, self.num_heads, hd)
        vh = vp.reshape(B, -1, self.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * hd**-0.5
        probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B, Nq, internal)
        return nn.Dense(self.embedding_dim, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DownsampleAttention(
                self.embedding_dim, self.num_heads, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampleAttention(
                self.embedding_dim, self.num_heads, name="self_attn"
            )(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampleAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        queries = queries + MLP(
            self.mlp_dim, self.embedding_dim, 2, name="mlp"
        )(queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampleAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int
    embedding_dim: int
    num_heads: int
    mlp_dim: int
    attention_downsample_rate: int = 2

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/image_pe: (B, h, w, C); points: (B, N, C)."""
        B, h, w, C = image_embedding.shape
        keys = image_embedding.reshape(B, h * w, C)
        key_pe = image_pe.reshape(B, h * w, C)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)

        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DownsampleAttention(
            self.embedding_dim, self.num_heads, self.attention_downsample_rate,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    transformer_dim: int
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = False
    iou_prediction_use_sigmoid: bool = False
    dynamic_multimask_via_stability: bool = False
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    pred_obj_scores: bool = False
    pred_obj_scores_mlp: bool = False
    use_multimask_token_for_obj_ptr: bool = False

    @property
    def num_mask_tokens(self):
        return self.num_multimask_outputs + 1

    @nn.compact
    def __call__(
        self,
        image_embeddings: jax.Array,   # (B, h, w, C)
        image_pe: jax.Array,           # (h, w, C)
        sparse_prompt_embeddings: jax.Array,
        dense_prompt_embeddings: jax.Array,
        multimask_output: bool,
        high_res_features: Optional[List[jax.Array]] = None,
    ):
        D = self.transformer_dim
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, D))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_mask_tokens, D)
        )
        s = 0
        if self.pred_obj_scores:
            obj_token = self.param(
                "obj_score_token", nn.initializers.normal(1.0), (1, D)
            )
            output_tokens = jnp.concatenate([obj_token, iou_token, mask_tokens])
            s = 1
        else:
            output_tokens = jnp.concatenate([iou_token, mask_tokens])
        B = sparse_prompt_embeddings.shape[0]
        tokens = jnp.concatenate(
            [jnp.broadcast_to(output_tokens[None], (B,) + output_tokens.shape),
             sparse_prompt_embeddings],
            axis=1,
        )

        src = image_embeddings + dense_prompt_embeddings
        pos_src = jnp.broadcast_to(image_pe[None], src.shape)
        b, h, w, c = src.shape

        hs, src_out = TwoWayTransformer(
            depth=2, embedding_dim=D, num_heads=8, mlp_dim=2048,
            name="transformer",
        )(src, pos_src, tokens)
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1 : s + 1 + self.num_mask_tokens]

        src_map = src_out.reshape(b, h, w, c)
        dc1 = ConvTranspose2d(D // 4, 2, stride=2, name="output_upscaling_0")
        ln1 = LayerNorm2d(D // 4, name="output_upscaling_1")
        dc2 = ConvTranspose2d(D // 8, 2, stride=2, name="output_upscaling_3")
        if not self.use_high_res_features:
            up = nn.gelu(ln1(dc1(src_map)))
            up = nn.gelu(dc2(up))
        else:
            feat_s0, feat_s1 = high_res_features
            up = nn.gelu(ln1(dc1(src_map) + feat_s1))
            up = nn.gelu(dc2(up) + feat_s0)

        hyper = jnp.stack(
            [
                MLP(D, D // 8, 3, name=f"output_hypernetworks_mlps_{i}")(
                    mask_tokens_out[:, i]
                )
                for i in range(self.num_mask_tokens)
            ],
            axis=1,
        )  # (B, T, D//8)
        bu, hu, wu, cu = up.shape
        masks = jnp.einsum("btc,bhwc->bthw", hyper, up)

        iou_pred = MLP(
            self.iou_head_hidden_dim, self.num_mask_tokens,
            self.iou_head_depth,
            sigmoid_output=self.iou_prediction_use_sigmoid,
            name="iou_prediction_head",
        )(iou_token_out)
        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                object_score_logits = MLP(
                    D, 1, 3, name="pred_obj_score_head"
                )(hs[:, 0])
            else:
                object_score_logits = nn.Dense(
                    1, name="pred_obj_score_head"
                )(hs[:, 0])
        else:
            object_score_logits = 10.0 * jnp.ones((B, 1), iou_pred.dtype)

        # output selection (`mask_decoder.py:141-160`)
        if multimask_output:
            out_masks = masks[:, 1:]
            out_iou = iou_pred[:, 1:]
        elif self.dynamic_multimask_via_stability:
            out_masks, out_iou = self._dynamic_multimask(masks, iou_pred)
        else:
            out_masks = masks[:, 0:1]
            out_iou = iou_pred[:, 0:1]

        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return out_masks, out_iou, sam_tokens_out, object_score_logits

    def _stability(self, mask_logits):
        flat = mask_logits.reshape(mask_logits.shape[:-2] + (-1,))
        d = self.dynamic_multimask_stability_delta
        area_i = jnp.sum(flat > d, axis=-1).astype(jnp.float32)
        area_u = jnp.sum(flat > -d, axis=-1).astype(jnp.float32)
        return jnp.where(area_u > 0, area_i / area_u, 1.0)

    def _dynamic_multimask(self, all_masks, all_iou):
        multi = all_masks[:, 1:]
        multi_iou = all_iou[:, 1:]
        best = jnp.argmax(multi_iou, axis=-1)
        bidx = jnp.arange(multi.shape[0])
        best_masks = multi[bidx, best][:, None]
        best_iou = multi_iou[bidx, best][:, None]
        single = all_masks[:, 0:1]
        single_iou = all_iou[:, 0:1]
        stable = (
            self._stability(single) >= self.dynamic_multimask_stability_thresh
        )
        masks = jnp.where(stable[..., None, None], single, best_masks)
        iou = jnp.where(stable, single_iou, best_iou)
        return masks, iou
