"""Single typed configuration for the whole framework.

The reference scatters configuration across four systems (module constants in
demo.py:57-83, a yaml opt loader, mmengine, and hydra for SAM2).  Here one
dataclass tree covers the model, runtime and post-processing knobs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """DINOv2-style vision transformer used as the patch embedder.

    Mirrors `iggt/layers/vision_transformer.py:42-180` (vit_large factory at
    :379-390) with the aggregator's overrides (`iggt/models/aggregator.py:148-184`):
    4 register tokens, layerscale init 1.0, antialiased pos-embed interpolation.
    """

    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    init_values: float = 1.0  # layerscale
    interpolate_antialias: bool = True
    interpolate_offset: float = 0.0
    ln_eps: float = 1e-6

    def __post_init__(self):
        # the DinoViT pos-embed interpolation implements the released
        # checkpoint's semantics (antialias=True, offset=0.0 — the
        # `*_reg` factories, `vision_transformer.py:183-215`); fail fast
        # rather than silently ignore other settings
        if not self.interpolate_antialias or self.interpolate_offset != 0.0:
            raise NotImplementedError(
                "only interpolate_antialias=True, interpolate_offset=0.0 "
                "(the dinov2_vitl14_reg semantics) are implemented"
            )

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


@dataclasses.dataclass(frozen=True)
class AggregatorConfig:
    """Alternating-attention trunk (`iggt/models/aggregator.py:19-141`)."""

    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24  # pairs of (frame, global) blocks
    num_heads: int = 16
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    qkv_bias: bool = True
    proj_bias: bool = True
    ffn_bias: bool = True
    patch_embed: str = "dinov2_vitl14_reg"  # or "conv"
    aa_order: Tuple[str, ...] = ("frame", "global")
    # consecutive blocks per frame/global alternation step; the released
    # checkpoint (and reference default) is 1 and only 1 is implemented
    aa_block_size: int = 1
    qk_norm: bool = True
    rope_freq: float = 100.0
    init_values: float = 0.01  # layerscale for the AA blocks
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)

    def __post_init__(self):
        if self.aa_block_size != 1:
            raise NotImplementedError(
                "aa_block_size > 1 (block-grouped alternation) is not "
                "implemented; the reference default and released "
                "checkpoint use 1"
            )

    @property
    def patch_start_idx(self) -> int:
        # 1 camera token + register tokens (`aggregator.py:127-130`)
        return 1 + self.num_register_tokens

    @property
    def token_dim(self) -> int:
        """Dim of each aggregated output (frame ++ global concat)."""
        return 2 * self.embed_dim

    def with_vit(self) -> "AggregatorConfig":
        """Sync the nested ViT config with the trunk geometry."""
        vit = dataclasses.replace(
            self.vit,
            img_size=self.img_size,
            patch_size=self.patch_size,
            num_register_tokens=self.num_register_tokens,
        )
        return dataclasses.replace(self, vit=vit)


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    """DPT dense decoder head (`iggt/heads/dpt_head.py:21-130`)."""

    dim_in: int = 2048
    patch_size: int = 14
    output_dim: int = 4
    activation: str = "inv_log"
    conf_activation: str = "expp1"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    pos_embed: bool = True
    use_point_feat: bool = False
    down_ratio: int = 1
    for_tracker: bool = False
    # reference default is 12 (40GB A100, `dpt_head.py:135`).  This is an
    # *upper bound*: models/vggt.py scans the largest divisor of S within
    # it.  8 lets an 8-view 518px scene decode in one pass on 16GB v5e
    # (+3.5% end-to-end over chunks of 4) while still bounding longer
    # sequences.
    frames_chunk_size: int = 8


@dataclasses.dataclass(frozen=True)
class CameraHeadConfig:
    """Iterative pose regression head (`iggt/heads/camera_head.py:19-82`)."""

    dim_in: int = 2048
    trunk_depth: int = 4
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float = 0.01
    target_dim: int = 9  # absT(3) + quaR(4) + FoV(2)
    num_iterations: int = 4
    trans_act: str = "linear"
    quat_act: str = "linear"
    fl_act: str = "relu"


@dataclasses.dataclass(frozen=True)
class PartHeadConfig:
    """Instance-feature head (`iggt/heads/part_head.py:14-100`)."""

    dim_in: int = 2048
    patch_size: int = 14
    output_dim: int = 8
    activation: str = "norm"
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 256, 256, 256)
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    pos_embed: bool = True
    window_size: int = 8
    ca_num_heads: int = 8  # MemEffCrossAttention at fusion levels 4 and 3
    swin_num_heads: int = 4
    # "reference" replicates the checkpoint's channel-scrambled OCAB q
    # partition (`window_sa.py:280-287`); "hat" is the spatially-correct
    # variant for from-scratch training.
    q_window_mode: str = "reference"
    # upper bound on the part-path view chunk (see models/vggt.py)
    frames_chunk_size: int = 8


@dataclasses.dataclass(frozen=True)
class TrackHeadConfig:
    """CoTracker-style tracker head (`iggt/heads/track_head.py:12-72`)."""

    dim_in: int = 2048
    patch_size: int = 14
    features: int = 128
    iters: int = 4
    corr_levels: int = 7
    corr_radius: int = 4
    hidden_size: int = 384
    predict_conf: bool = True
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Full IGGT/VGGT model assembly (`iggt/models/vggt.py:132-147`)."""

    name: str = "iggt"  # "iggt" | "vggt"
    img_size: int = 518
    patch_size: int = 14
    embed_dim: int = 1024
    aggregator: AggregatorConfig = dataclasses.field(default_factory=AggregatorConfig)
    enable_camera: bool = True
    enable_depth: bool = True
    enable_point: bool = True
    enable_part: bool = True
    enable_track: bool = False
    intermediate_layer_idx: Tuple[int, ...] = (4, 11, 17, 23)
    camera: CameraHeadConfig = dataclasses.field(default_factory=CameraHeadConfig)
    part: PartHeadConfig = dataclasses.field(default_factory=PartHeadConfig)
    track: TrackHeadConfig = dataclasses.field(default_factory=TrackHeadConfig)
    # numerics: trunk runs in bf16, heads + RoPE forced fp32 mirroring
    # `demo.py:191-195` + `vggt.py:189` + `heads/block.py:165-170`.
    trunk_dtype: str = "bfloat16"
    head_dtype: str = "float32"
    # upper bound on views decoded per DPT-head scan chunk (peak-HBM knob,
    # ref `dpt_head.py:130` frames_chunk_size); 0 decodes all views at once
    frames_chunk_size: int = 8

    @property
    def depth_head(self) -> DPTConfig:
        return DPTConfig(
            dim_in=2 * self.embed_dim,
            patch_size=self.patch_size,
            output_dim=2,
            activation="exp",
            conf_activation="expp1",
            intermediate_layer_idx=self.intermediate_layer_idx,
            use_point_feat=False,
            frames_chunk_size=self.frames_chunk_size,
        )

    @property
    def point_head(self) -> DPTConfig:
        return DPTConfig(
            dim_in=2 * self.embed_dim,
            patch_size=self.patch_size,
            output_dim=4,
            activation="inv_log",
            conf_activation="expp1",
            intermediate_layer_idx=self.intermediate_layer_idx,
            use_point_feat=(self.name == "iggt"),
            frames_chunk_size=self.frames_chunk_size,
        )

    def scaled(self, embed_dim: int, depth: int, num_heads: int,
               vit_depth: Optional[int] = None, img_size: int = 518,
               patch_embed: str = "dinov2_vitl14_reg") -> "ModelConfig":
        """A smaller variant (for tests / debug)."""
        vit = ViTConfig(
            img_size=img_size, patch_size=self.patch_size, embed_dim=embed_dim,
            depth=vit_depth if vit_depth is not None else depth,
            num_heads=num_heads,
        )
        agg = AggregatorConfig(
            img_size=img_size, patch_size=self.patch_size, embed_dim=embed_dim,
            depth=depth, num_heads=num_heads, patch_embed=patch_embed, vit=vit,
        ).with_vit()
        idx = tuple(sorted({depth // 6, depth // 2, (3 * depth) // 4, depth - 1}))
        while len(idx) < 4:  # tiny depths: repeat the last layer
            idx = idx + (depth - 1,)
        return dataclasses.replace(
            self,
            img_size=img_size,
            embed_dim=embed_dim,
            aggregator=agg,
            intermediate_layer_idx=idx[:4],
            camera=dataclasses.replace(
                self.camera, dim_in=2 * embed_dim,
                num_heads=min(num_heads, 2 * embed_dim // 32)),
            part=dataclasses.replace(
                self.part, dim_in=2 * embed_dim,
                intermediate_layer_idx=idx[:4]),
            track=dataclasses.replace(
                self.track, dim_in=2 * embed_dim,
                intermediate_layer_idx=idx[:4]),
        )


@dataclasses.dataclass(frozen=True)
class ClusteringConfig:
    """HDBSCAN / KNN post-processing (`demo.py:62-83`, "Large" preset)."""

    eps: float = 0.06
    min_samples: int = 100
    min_cluster_size: int = 500
    knn_k: int = 20
    # exact=True runs the weighted HDBSCAN at full pixel density (the
    # reference algorithm verbatim; minutes at demo scale even with the
    # device kNN); False clusters a <=150k uniform subsample with
    # density-scaled parameters (seconds; see PERF.md for the measured
    # fidelity envelope)
    exact: bool = False


# Presets from demo.py:63-83
CLUSTERING_SMALL = ClusteringConfig(eps=0.005, min_samples=50)
CLUSTERING_MEDIUM = ClusteringConfig(eps=0.01, min_samples=100)
CLUSTERING_LARGE = ClusteringConfig(eps=0.06, min_samples=100)


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Execution knobs for the inference app (`demo.py:57-60`)."""

    image_size: Tuple[int, int] = (504, 336)  # (W, H)
    conf_threshold: float = 0.3
    clustering: ClusteringConfig = dataclasses.field(default_factory=ClusteringConfig)
    use_flash_attention: bool = True
    # Pallas fused LayerNorm (ops/fused_ln.py) — bit-identical to the XLA
    # LN (tests/test_heads.py::test_fused_ln_bit_identical).  Measured
    # end-to-end on v5e it is a net LOSS at the flagship shape (11.09 vs
    # 11.22 views/s, repeated A/B — the standalone kernel breaks XLA's
    # fusion of the LN chain into neighbouring epilogues and pays extra
    # HBM round trips), so it defaults OFF; kept for shapes where the
    # convert_reduce bucket dominates (PERF.md "fused LayerNorm" row).
    fused_ln: bool = False
    # merge this many KV tokens out of global attention (FastVGGT-style,
    # ops/token_merge.py); 0 = exact attention.  Worth enabling at 32+
    # views where token redundancy is high.
    global_merge_r: int = 0
    # zero out sky pixels' confidence before GLB export via per-view sky
    # keep-masks (`visual_util.py:112-159`; iggt_official_tpu/utils/sky.py)
    mask_sky: bool = False
    mesh_axes: Tuple[str, ...] = ("data", "seq")
    mesh_shape: Optional[Tuple[int, ...]] = None  # None => all devices on "data"
