"""Regenerate sam2_l_state_dict_manifest.json.

Builds the reference torch SAM2 at the Hiera-L v2.1 operating point
(`/root/reference/sam2/configs/sam2.1/sam2.1_hiera_l.yaml` — the size the
BASELINE grounding workload names) and dumps the exact (name, shape) list
of its state dict.  tests/test_sam2_manifest.py replays the converter over
int8 dummies of these shapes on every default-suite run, so the Hiera-L
converter surface stays pinned without needing torch weights.

Run from the repo root:  python tests/data/gen_sam2_l_manifest.py
"""

import json
import os.path as op
import sys

sys.path.insert(0, op.join(op.dirname(__file__), "..", ".."))

import tests.torch_ref as torch_ref


def build_torch_sam2_l_v21():
    torch_ref.install_stubs()
    from sam2.modeling.backbones.hieradet import Hiera
    from sam2.modeling.backbones.image_encoder import ImageEncoder, FpnNeck
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    from sam2.modeling.memory_attention import (
        MemoryAttention,
        MemoryAttentionLayer,
    )
    from sam2.modeling.sam.transformer import RoPEAttention
    from sam2.modeling.memory_encoder import (
        MemoryEncoder,
        MaskDownSampler,
        Fuser,
        CXBlock,
    )
    from sam2.modeling.sam2_base import SAM2Base

    trunk = Hiera(
        embed_dim=144, num_heads=2, stages=[2, 6, 36, 4],
        global_att_blocks=[23, 33, 43],
        window_pos_embed_bkg_spatial_size=[7, 7],
        window_spec=[8, 4, 16, 8],
    )
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=256, normalize=True, scale=None, temperature=10000
        ),
        d_model=256, backbone_channel_list=[1152, 576, 288, 144],
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest",
    )
    enc = ImageEncoder(scalp=1, trunk=trunk, neck=neck)
    layer = MemoryAttentionLayer(
        activation="relu", dim_feedforward=2048, dropout=0.1,
        pos_enc_at_attn=False,
        self_attention=RoPEAttention(
            rope_theta=10000.0, feat_sizes=[64, 64], embedding_dim=256,
            num_heads=1, downsample_rate=1, dropout=0.1,
        ),
        d_model=256, pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        cross_attention=RoPEAttention(
            rope_theta=10000.0, feat_sizes=[64, 64], rope_k_repeat=True,
            embedding_dim=256, num_heads=1, downsample_rate=1, dropout=0.1,
            kv_in_dim=64,
        ),
    )
    mem_attn = MemoryAttention(
        d_model=256, pos_enc_at_input=True, layer=layer, num_layers=4
    )
    mem_enc = MemoryEncoder(
        out_dim=64,
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=64, normalize=True, scale=None, temperature=10000
        ),
        mask_downsampler=MaskDownSampler(kernel_size=3, stride=2, padding=1),
        fuser=Fuser(
            layer=CXBlock(dim=256, kernel_size=7, padding=3,
                          layer_scale_init_value=1e-6, use_dwconv=True),
            num_layers=2,
        ),
    )
    # sam2.1_hiera_l.yaml model flags (v2.1: tpos enc on obj ptrs + spatial
    # no-object embedding)
    return SAM2Base(
        image_encoder=enc, memory_attention=mem_attn, memory_encoder=mem_enc,
        num_maskmem=7, image_size=1024, sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True, no_obj_embed_spatial=True,
        use_high_res_features_in_sam=True,
        multimask_output_in_sam=True, iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True, add_tpos_enc_to_obj_ptrs=True,
        proj_tpos_enc_in_obj_ptrs=True, use_signed_tpos_enc_to_obj_ptrs=True,
        only_obj_ptrs_in_the_past_for_eval=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0, multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True,
    )


if __name__ == "__main__":
    model = build_torch_sam2_l_v21()
    manifest = [
        [name, list(t.shape)] for name, t in model.state_dict().items()
    ]
    out = op.join(op.dirname(op.abspath(__file__)),
                  "sam2_l_state_dict_manifest.json")
    with open(out, "w") as f:
        json.dump(manifest, f)
    print(f"wrote {len(manifest)} entries to {out}")
