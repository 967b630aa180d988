"""SAM2Base: jittable model core for image + video segmentation.

Behavioural parity: `sam2/modeling/sam2_base.py:28-907`.  The flax module
holds every learned component (image encoder, SAM heads, memory attention,
memory encoder, the no-mem / no-obj / temporal-position embeddings) and
exposes jit-friendly methods; the Python-side frame bookkeeping (which
memories condition which frame) lives in the predictors
(`iggt_official_tpu/sam2/video_predictor.py`), which assemble fixed-shape
memory tensors and call these methods.

Token layout is (B, N, C) / NHWC (the reference uses seq-first (HW, B, C)).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iggt_official_tpu.ops.conv import Conv2d
from iggt_official_tpu.ops.interpolate import bilinear_resize_align_corners
from iggt_official_tpu.sam2.common import MLP
from iggt_official_tpu.sam2.config import SAM2Config
from iggt_official_tpu.sam2.hiera import ImageEncoder
from iggt_official_tpu.sam2.memory import MemoryAttention, MemoryEncoder
from iggt_official_tpu.sam2.sam_heads import MaskDecoder, PromptEncoder

NO_OBJ_SCORE = -1024.0


def _resize_nhwc(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize on NHWC maps.

    The reference uses align_corners=False interpolation here
    (`sam2_base.py:367-372`); we use our align-corners resize — a
    sub-pixel difference on smooth mask logits."""
    return bilinear_resize_align_corners(x, hw)


def get_1d_sine_pe(pos: jax.Array, dim: int, temperature: float = 10000.0):
    """`sam2/modeling/sam2_utils.py` 1-D sine embedding."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / pe_dim)
    pos_embed = pos[..., None] / dim_t
    return jnp.concatenate([jnp.sin(pos_embed), jnp.cos(pos_embed)], axis=-1)


class SAM2Base(nn.Module):
    cfg: SAM2Config

    def setup(self):
        cfg = self.cfg
        self.image_encoder = ImageEncoder(cfg, name="image_encoder")
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=cfg.d_model,
            image_embedding_size=(cfg.image_size // 16, cfg.image_size // 16),
            input_image_size=(cfg.image_size, cfg.image_size),
            mask_in_chans=16,
            name="sam_prompt_encoder",
        )
        self.sam_mask_decoder = MaskDecoder(
            transformer_dim=cfg.d_model,
            use_high_res_features=cfg.use_high_res_features_in_sam,
            iou_prediction_use_sigmoid=cfg.iou_prediction_use_sigmoid,
            pred_obj_scores=cfg.pred_obj_scores,
            pred_obj_scores_mlp=cfg.pred_obj_scores_mlp,
            use_multimask_token_for_obj_ptr=cfg.use_multimask_token_for_obj_ptr,
            dynamic_multimask_via_stability=True,
            name="sam_mask_decoder",
        )
        self.memory_attention = MemoryAttention(
            d_model=cfg.d_model,
            num_layers=cfg.memory_attention_layers,
            dim_feedforward=cfg.memory_attention_dim_feedforward,
            rope_theta=cfg.memory_attention_rope_theta,
            feat_sizes=cfg.memory_attention_feat_sizes,
            kv_in_dim=cfg.memory_kv_in_dim,
            name="memory_attention",
        )
        self.memory_encoder = MemoryEncoder(
            out_dim=cfg.mem_dim, in_dim=cfg.d_model, name="memory_encoder"
        )
        # high-res projections for the decoder (`sam2_base.py:467-474`)
        if cfg.use_high_res_features_in_sam:
            self.conv_s0 = Conv2d(cfg.d_model // 8, 1, name="conv_s0")
            self.conv_s1 = Conv2d(cfg.d_model // 4, 1, name="conv_s1")
        # memory embeddings (`sam2_base.py:126-141`)
        init = nn.initializers.truncated_normal(0.02)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", init, (cfg.num_maskmem, 1, cfg.mem_dim)
        )
        self.no_mem_embed = self.param(
            "no_mem_embed", init, (1, 1, cfg.d_model)
        )
        self.no_mem_pos_enc = self.param(
            "no_mem_pos_enc", init, (1, 1, cfg.d_model)
        )
        if cfg.pred_obj_scores and cfg.use_obj_ptrs_in_encoder:
            self.no_obj_ptr = self.param(
                "no_obj_ptr", init, (1, cfg.d_model)
            )
        if cfg.no_obj_embed_spatial:
            self.no_obj_embed_spatial_p = self.param(
                "no_obj_embed_spatial", init, (1, cfg.mem_dim)
            )
        if cfg.use_obj_ptrs_in_encoder:
            self.mask_downsample = Conv2d(1, 4, stride=4, name="mask_downsample")
            if cfg.use_mlp_for_obj_ptr_proj:
                self.obj_ptr_proj = MLP(
                    cfg.d_model, cfg.d_model, 3, name="obj_ptr_proj"
                )
            else:
                self.obj_ptr_proj = nn.Dense(cfg.d_model, name="obj_ptr_proj")
        if cfg.proj_tpos_enc_in_obj_ptrs:
            self.obj_ptr_tpos_proj = nn.Dense(
                cfg.mem_dim, name="obj_ptr_tpos_proj"
            )

    # ------------------------------------------------------------------
    def forward_image(self, images: jax.Array) -> Dict:
        """images (B, H, W, 3) -> backbone dict with projected high-res
        levels (`sam2_base.py:461-474`)."""
        out = self.image_encoder(images)
        if self.cfg.use_high_res_features_in_sam:
            fpn = list(out["backbone_fpn"])
            fpn[0] = self.conv_s0(fpn[0])
            fpn[1] = self.conv_s1(fpn[1])
            out["backbone_fpn"] = fpn
        return out

    __call__ = forward_image  # default apply target

    def init_all(self, images: jax.Array):
        """Trace every submodule once so `init` creates all parameters."""
        cfg = self.cfg
        out = self.forward_image(images)
        feats = out["backbone_fpn"][-1]
        hi = (
            list(out["backbone_fpn"][:2])
            if cfg.use_high_res_features_in_sam
            else None
        )
        res = self.forward_sam_heads(
            feats, None, None, hi, multimask_output=True
        )
        mem_f, mem_p = self.encode_new_memory(
            feats, jnp.moveaxis(res[4], 1, -1), res[6]
        )
        B, h, w, C = feats.shape
        curr = feats.reshape(B, h * w, C)
        cp = out["vision_pos_enc"][-1].reshape(B, h * w, C)
        fused = self.condition_on_memory(
            curr, cp,
            mem_f.reshape(B, -1, mem_f.shape[-1]),
            mem_p.reshape(B, -1, mem_p.shape[-1]),
        )
        if cfg.use_obj_ptrs_in_encoder:
            self.downsample_mask_input(
                jnp.zeros((B, cfg.image_size, cfg.image_size, 1))
            )
            self.obj_ptr_tpos(jnp.zeros((1,)))
        _ = self.no_memory_features(curr)
        _ = self.memory_tpos(jnp.zeros((1,), jnp.int32))
        # trace the mask-prompt path so mask_conv*/mask_ln* exist
        _ = self.sam_prompt_encoder(masks=jnp.zeros((B, 4 * h, 4 * w, 1)))
        return fused

    # ------------------------------------------------------------------
    def forward_sam_heads(
        self,
        backbone_features: jax.Array,      # (B, h, w, C)
        point_inputs: Optional[Dict] = None,
        mask_inputs: Optional[jax.Array] = None,  # (B, 16h, 16w, 1)
        high_res_features: Optional[List[jax.Array]] = None,
        multimask_output: bool = False,
    ):
        """`sam2_base.py:251-408`.  Returns (low_res_multimasks,
        high_res_multimasks, ious, low_res_masks, high_res_masks, obj_ptr,
        object_score_logits); mask maps NHWC with channel = mask index."""
        cfg = self.cfg
        B, h, w, _ = backbone_features.shape

        if point_inputs is not None:
            coords = point_inputs["point_coords"]
            labels = point_inputs["point_labels"]
        else:
            coords = jnp.zeros((B, 1, 2), jnp.float32)
            labels = -jnp.ones((B, 1), jnp.int32)

        sam_mask_prompt = None
        if mask_inputs is not None:
            target = (4 * h, 4 * w)
            if mask_inputs.shape[1:3] != target:
                sam_mask_prompt = _resize_nhwc(
                    mask_inputs.astype(jnp.float32), target
                )
            else:
                sam_mask_prompt = mask_inputs.astype(jnp.float32)

        sparse, dense = self.sam_prompt_encoder(
            points=(coords, labels), boxes=None, masks=sam_mask_prompt
        )
        image_pe = self.sam_prompt_encoder.get_dense_pe()
        low_multi, ious, sam_tokens, obj_logits = self.sam_mask_decoder(
            image_embeddings=backbone_features,
            image_pe=image_pe,
            sparse_prompt_embeddings=sparse,
            dense_prompt_embeddings=dense,
            multimask_output=multimask_output,
            high_res_features=high_res_features,
        )  # low_multi (B, M, 4h, 4w)

        if cfg.pred_obj_scores:
            is_obj = obj_logits > 0
            low_multi = jnp.where(
                is_obj[:, :, None, None], low_multi, NO_OBJ_SCORE
            )
        low_multi = low_multi.astype(jnp.float32)
        # (B, M, h', w') -> NHWC resize
        hi_multi = _resize_nhwc(
            jnp.moveaxis(low_multi, 1, -1), (cfg.image_size, cfg.image_size)
        )
        hi_multi = jnp.moveaxis(hi_multi, -1, 1)

        sam_token = sam_tokens[:, 0]
        if multimask_output:
            best = jnp.argmax(ious, axis=-1)
            bidx = jnp.arange(B)
            low_res_masks = low_multi[bidx, best][:, None]
            high_res_masks = hi_multi[bidx, best][:, None]
            if sam_tokens.shape[1] > 1:
                sam_token = sam_tokens[bidx, best]
        else:
            low_res_masks, high_res_masks = low_multi, hi_multi

        obj_ptr = self.obj_ptr_proj(sam_token)
        if cfg.pred_obj_scores:
            lam = (obj_logits > 0).astype(jnp.float32)
            if cfg.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1 - lam) * self.no_obj_ptr

        return (
            low_multi, hi_multi, ious, low_res_masks, high_res_masks,
            obj_ptr, obj_logits,
        )

    # ------------------------------------------------------------------
    def condition_on_memory(
        self,
        curr_feats: jax.Array,        # (B, N, C) top-level tokens
        curr_pos: jax.Array,          # (B, N, C)
        memory: jax.Array,            # (B, M, mem_dim)
        memory_pos: jax.Array,        # (B, M, mem_dim)
        num_obj_ptr_tokens: int = 0,
        key_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Memory-attention fusion (`sam2_base.py:648-671`).  `key_mask`
        marks valid memory tokens when the bank is padded to a fixed shape
        (keeps the jitted program static across the video)."""
        return self.memory_attention(
            curr_feats, memory, curr_pos, memory_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens, key_mask=key_mask,
        )

    def no_memory_features(self, curr_feats: jax.Array) -> jax.Array:
        """Initial-frame path (`sam2_base.py:652-658`,
        directly_add_no_mem_embed)."""
        return curr_feats + self.no_mem_embed

    def memory_tpos(self, t_pos_rel: jax.Array) -> jax.Array:
        """maskmem temporal embedding rows for relative positions."""
        return self.maskmem_tpos_enc[t_pos_rel][:, 0]

    def obj_ptr_tpos(self, pos_norm: jax.Array) -> jax.Array:
        """Temporal sine embedding for object pointers
        (`sam2_base.py:622-631`)."""
        cfg = self.cfg
        dim = cfg.d_model if cfg.proj_tpos_enc_in_obj_ptrs else cfg.mem_dim
        enc = get_1d_sine_pe(pos_norm, dim)
        if cfg.proj_tpos_enc_in_obj_ptrs:
            enc = self.obj_ptr_tpos_proj(enc)
        return enc

    def downsample_mask_input(self, mask: jax.Array) -> jax.Array:
        """Stride-4 learned downsample of mask prompts (`sam2_base.py:104`)."""
        return self.mask_downsample(mask)

    # ------------------------------------------------------------------
    def propagate_step(
        self,
        feats_map: jax.Array,                 # (B, h, w, C) top-level feats
        curr_pos: jax.Array,                  # (B, h*w, C)
        high_res_features,                    # list of maps or None (static)
        mem_slots,                            # tuple of (B, hw, mem_dim)
        pos_slots,                            # tuple of (B, hw, mem_dim)
        tpos_idx: jax.Array,                  # (n_slots,) int32 tpos rows
        slot_valid: jax.Array,                # (n_slots,) bool
        obj_ptrs,                             # tuple of (d_model,) pointers
        ptr_pos_norm: jax.Array,              # (max_ptrs,) normalized t-pos
        n_valid_ptrs: jax.Array,              # () int32
        multimask_output: bool = False,
    ):
        """One whole non-conditioning tracking step, fused.

        Memory-bank assembly (temporal embeddings, pointer splitting,
        validity masks) + memory attention + SAM heads + memory encoding in
        a single jittable call: the streaming loop costs ~3 dispatches per
        frame instead of ~200 eager ops, which is what bounds throughput on
        a high-dispatch-latency (remote) device.  Matches the composition
        of `condition_on_memory` + `forward_sam_heads` +
        `encode_new_memory` exactly (`sam2_base.py:491-729`).
        """
        cfg = self.cfg
        B, h, w, C = feats_map.shape
        curr = feats_map.reshape(B, h * w, C)
        md = cfg.mem_dim
        hw_mem = mem_slots[0].shape[1]
        n_slots = len(mem_slots)

        rows = self.maskmem_tpos_enc[tpos_idx][:, 0]          # (n_slots, md)
        mem = jnp.concatenate(mem_slots, axis=1)              # (B, n*hw, md)
        pos = jnp.concatenate(
            [p + r[None, None] for p, r in zip(pos_slots, rows)], axis=1
        )
        spatial_mask = jnp.repeat(slot_valid, hw_mem)[None]   # (1, n*hw)

        if cfg.use_obj_ptrs_in_encoder:
            split = max(cfg.d_model // md, 1)
            if isinstance(obj_ptrs, (tuple, list)):
                ptrs = jnp.stack(obj_ptrs)[None]   # (1, max_ptrs, d_model)
            else:
                ptrs = obj_ptrs                    # (B, max_ptrs, d_model)
            max_ptrs = ptrs.shape[1]
            n_ptr_tokens = max_ptrs * split
            ptr_tokens = ptrs.reshape(ptrs.shape[0], n_ptr_tokens, md)
            if cfg.add_tpos_enc_to_obj_ptrs:
                enc = self.obj_ptr_tpos(ptr_pos_norm)         # (max_ptrs, md)
            else:
                enc = jnp.zeros((max_ptrs, md), jnp.float32)
            ptr_pos = jnp.broadcast_to(
                jnp.repeat(enc, split, axis=0)[None],
                (ptr_tokens.shape[0], n_ptr_tokens, md),
            )
            ptr_mask = (
                jnp.arange(n_ptr_tokens) < n_valid_ptrs * split
            )[None]

            memory = jnp.concatenate([mem, ptr_tokens], axis=1)
            memory_pos = jnp.concatenate([pos, ptr_pos], axis=1)
            key_mask = jnp.concatenate([spatial_mask, ptr_mask], axis=1)
        else:
            # reference gates pointer tokens on use_obj_ptrs_in_encoder
            # (`sam2_base.py:570-575`, default False): no ptr tokens in
            # the memory bank at all
            n_ptr_tokens = 0
            memory, memory_pos, key_mask = mem, pos, spatial_mask

        fused = self.memory_attention(
            curr, memory, curr_pos, memory_pos,
            num_obj_ptr_tokens=n_ptr_tokens, key_mask=key_mask,
        ).reshape(B, h, w, C)

        (_, _, ious, low_res_masks, high_res_masks, obj_ptr,
         obj_logits) = self.forward_sam_heads(
            fused, None, None, high_res_features, multimask_output
        )
        mem_feats, mem_pos = self.encode_new_memory(
            feats_map, jnp.moveaxis(high_res_masks, 1, -1), obj_logits
        )
        return low_res_masks, obj_ptr, obj_logits, mem_feats, mem_pos

    # ------------------------------------------------------------------
    def encode_new_memory(
        self,
        pix_feat: jax.Array,               # (B, h, w, C) top-level features
        pred_masks_high_res: jax.Array,    # (B, 16h, 16w, 1)
        object_score_logits: jax.Array,    # (B, 1)
    ):
        """`sam2_base.py:672-729`."""
        cfg = self.cfg
        mask_for_mem = jax.nn.sigmoid(pred_masks_high_res)
        mask_for_mem = (
            mask_for_mem * cfg.sigmoid_scale_for_mem_enc
            + cfg.sigmoid_bias_for_mem_enc
        )
        out = self.memory_encoder(pix_feat, mask_for_mem,
                                  skip_mask_sigmoid=True)
        feats = out["vision_features"]
        pos = out["vision_pos_enc"][-1]
        if cfg.no_obj_embed_spatial:
            is_obj = (object_score_logits > 0).astype(jnp.float32)
            feats = feats + (1 - is_obj[..., None, None]) * \
                self.no_obj_embed_spatial_p[None]
        return feats, pos
