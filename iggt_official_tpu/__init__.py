"""IGGT-TPU: a TPU-native (JAX/XLA/Pallas) re-design of IGGT.

IGGT ("Instance-Grounded Geometry Transformer") is a feed-forward multi-view
3D reconstruction + instance-grounding model.  This package rebuilds the
capabilities of the reference PyTorch/CUDA implementation
(lifuguan/IGGT_official) as an idiomatic JAX framework:

- ``layers/``    ViT primitives (2D RoPE, qk-norm attention, pre-norm blocks,
                 DINOv2 vision transformer) built on flax.linen with a Pallas
                 flash-attention fast path.
- ``models/``    the alternating-attention Aggregator trunk and the VGGT/IGGT
                 model assemblies.
- ``heads/``     camera / DPT depth / point / part / track heads.
- ``ops/``       TPU kernels and host ops: fused attention, KNN smoothing,
                 density clustering, PCA colormap, resize.
- ``geometry/``  pose codecs, quaternions, unprojection — pure jnp functions.
- ``parallel/``  device-mesh construction and sharding rules (dp/sp/tp).
- ``utils/``     image IO, checkpointing (orbax + torch converter), GLB export.
- ``eval/``      depth/pose/instance metrics and the scene evaluator.
- ``app/``       the demo-equivalent CLI surface.

Reference parity notes cite files as ``<path>:<line>`` under
``/root/reference`` (the upstream repo snapshot).
"""

__version__ = "0.1.0"
