"""SAM2 checkpoint conversion coverage: every tensor of the reference
torch SAM2 (hiera-tiny wiring from `sam2/sam2_hiera_t.yaml`) must land on a
matching flax parameter, with zero missing / unused / shape-mismatched.

Slow (builds the full torch hiera-T and inits the flax model); run with
RUN_SLOW=1.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _build_torch_sam2_t():
    import tests.torch_ref as torch_ref

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
        embed_dim=96, num_heads=1, stages=[1, 2, 7, 2],
        global_att_blocks=[5, 7, 9],
        window_pos_embed_bkg_spatial_size=[7, 7],
    )
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=256, normalize=True, scale=None, temperature=10000
        ),
        d_model=256, backbone_channel_list=[768, 384, 192, 96],
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
    return SAM2Base(
        image_encoder=enc, memory_attention=mem_attn, memory_encoder=mem_enc,
        num_maskmem=7, image_size=1024, sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True, use_high_res_features_in_sam=True,
        multimask_output_in_sam=True, iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True, add_tpos_enc_to_obj_ptrs=False,
        only_obj_ptrs_in_the_past_for_eval=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0, multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True,
    )


def test_sam2_checkpoint_conversion_full_coverage():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from iggt_official_tpu.sam2.base import SAM2Base
    from iggt_official_tpu.sam2.config import HieraConfig, SAM2Config
    from iggt_official_tpu.utils.torch_convert import (
        align_params,
        sam2_state_dict_to_flax,
    )

    ref = _build_torch_sam2_t()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    loaded = sam2_state_dict_to_flax(sd)

    # hiera_t flags; small image so flax init stays fast — parameter
    # structure does not depend on the image size
    cfg = SAM2Config(
        image_size=128,
        hiera=HieraConfig(
            embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
            global_att_blocks=(5, 7, 9),
            window_pos_embed_bkg_spatial_size=(7, 7),
            window_spec=(8, 4, 14, 7),
        ),
        memory_attention_feat_sizes=(8, 8),
        add_tpos_enc_to_obj_ptrs=False,
        proj_tpos_enc_in_obj_ptrs=False,
        use_signed_tpos_enc_to_obj_ptrs=False,
        no_obj_embed_spatial=False,
    )
    model = SAM2Base(cfg)
    imgs = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), imgs, method=model.init_all)[
        "params"
    ]

    merged, report = align_params(params, loaded, log=None)
    assert report["missing"] == [], report["missing"][:10]
    assert report["unused"] == [], report["unused"][:10]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:10]
    assert len(report["matched"]) == len(sd) - 3  # 4 point embeds stack to 1

    # spot-check a value actually flowed through the layout transforms
    pe = np.asarray(
        merged["image_encoder"]["trunk"]["pos_embed"]
    )
    np.testing.assert_allclose(
        pe, sd["image_encoder.trunk.pos_embed"][0].transpose(1, 2, 0)
    )

    # numeric parity: converted weights must reproduce the torch image
    # encoder (fp32 accumulation order differs, hence 1e-3 not bitwise)
    import torch

    ref.eval()
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        t_out = ref.forward_image(torch.from_numpy(x))
    f_out = model.apply(
        {"params": merged}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        method=model.forward_image,
    )
    for tf, ff in zip(t_out["backbone_fpn"], f_out["backbone_fpn"]):
        tn = tf.numpy().transpose(0, 2, 3, 1)
        fn = np.asarray(ff)
        err = np.abs(tn - fn).max() / (np.abs(tn).max() + 1e-8)
        assert err < 1e-3, err

    # the mask-prompt path (newly traced in init_all) runs with real weights
    feats = f_out["backbone_fpn"][-1]
    hi = list(f_out["backbone_fpn"][:2])
    _, h, w, _ = feats.shape
    mask_in = jnp.asarray(
        rng.normal(0, 4, (1, 16 * h, 16 * w, 1)).astype(np.float32)
    )
    res = model.apply(
        {"params": merged}, feats, None, mask_in, hi,
        method=model.forward_sam_heads, multimask_output=False,
    )
    assert np.asarray(res[4]).shape == (1, 1, 16 * h, 16 * w)
