"""Aggregator parity vs the reference (conv patch embed + full DINOv2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from iggt_official_tpu.config import AggregatorConfig, ViTConfig
from iggt_official_tpu.models.aggregator import Aggregator, slice_expand_and_flatten
from iggt_official_tpu.utils.torch_convert import torch_state_dict_to_flax

from . import torch_ref


@pytest.fixture(scope="module")
def ref():
    return torch_ref.iggt_modules()


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_slice_expand_and_flatten():
    tok = np.arange(2 * 3 * 4, dtype=np.float32).reshape(1, 2, 3, 4)
    out = np.asarray(slice_expand_and_flatten(jnp.asarray(tok), B=2, S=3))
    assert out.shape == (6, 3, 4)
    # frame 0 of each batch gets slot 0, frames 1..S-1 get slot 1
    np.testing.assert_array_equal(out[0], tok[0, 0])
    np.testing.assert_array_equal(out[1], tok[0, 1])
    np.testing.assert_array_equal(out[2], tok[0, 1])
    np.testing.assert_array_equal(out[3], tok[0, 0])


def test_aggregator_parity_conv(ref):
    import torch
    from iggt.models.aggregator import Aggregator as TAggregator

    rng = np.random.default_rng(0)
    B, S, H, W = 1, 3, 56, 70
    tagg = TAggregator(
        img_size=56, patch_size=14, embed_dim=64, depth=2, num_heads=4,
        patch_embed="conv", enable_checkpoint=False,
    )
    tagg.eval()
    with torch.no_grad():
        # camera/register tokens init at 1e-6; scale up for a meaningful test
        tagg.camera_token.mul_(1e6)
        tagg.register_token.mul_(1e6)

    imgs = rng.uniform(0, 1, (B, S, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out_ref, psi_ref = tagg(torch.from_numpy(imgs))

    cfg = AggregatorConfig(
        img_size=56, patch_size=14, embed_dim=64, depth=2, num_heads=4,
        patch_embed="conv",
    )
    params = torch_state_dict_to_flax(_sd(tagg))
    jagg = Aggregator(cfg)
    out_jax, psi_jax = jagg.apply(
        {"params": params}, jnp.asarray(imgs.transpose(0, 1, 3, 4, 2))
    )

    assert psi_ref == psi_jax == 5
    assert len(out_ref) == len(out_jax) == 2
    for o_ref, o_jax in zip(out_ref, out_jax):
        np.testing.assert_allclose(
            o_ref.numpy(), np.asarray(o_jax), atol=1e-4
        )


@pytest.mark.slow
def test_aggregator_parity_dinovit(ref):
    """Full path incl. DINOv2 patch embed (small dims, rectangular input)."""
    import torch
    from iggt.models.aggregator import Aggregator as TAggregator

    rng = np.random.default_rng(1)
    B, S, H, W = 1, 2, 56, 56
    tagg = TAggregator(
        img_size=56, patch_size=14, embed_dim=384, depth=2, num_heads=6,
        patch_embed="dinov2_vits14_reg", enable_checkpoint=False,
    )
    tagg.eval()
    with torch.no_grad():
        tagg.camera_token.mul_(1e6)
        tagg.register_token.mul_(1e6)
        tagg.patch_embed.pos_embed.normal_(std=0.5)
        tagg.patch_embed.cls_token.normal_(std=0.5)
        tagg.patch_embed.register_tokens.normal_(std=0.5)

    imgs = rng.uniform(0, 1, (B, S, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out_ref, _ = tagg(torch.from_numpy(imgs))

    vit = ViTConfig(img_size=56, patch_size=14, embed_dim=384, depth=12,
                    num_heads=6, num_register_tokens=4, init_values=1.0)
    cfg = AggregatorConfig(
        img_size=56, patch_size=14, embed_dim=384, depth=2, num_heads=6,
        patch_embed="dinov2_vits14_reg", vit=vit,
    )
    params = torch_state_dict_to_flax(_sd(tagg))
    jagg = Aggregator(cfg)
    out_jax, _ = jagg.apply(
        {"params": params}, jnp.asarray(imgs.transpose(0, 1, 3, 4, 2))
    )
    for o_ref, o_jax in zip(out_ref, out_jax):
        np.testing.assert_allclose(o_ref.numpy(), np.asarray(o_jax), atol=5e-4)
