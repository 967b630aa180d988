"""Full-model checkpoint-converter coverage vs the reference IGGT.

Builds the actual reference IGGT (ViT-L, ~1.3B params) on CPU, converts its
complete state dict, and checks that every parameter lands on a flax slot
with the right shape — no missing, no unused, no mismatches.  Marked slow
(RUN_SLOW=1) because of the model size.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from . import torch_ref


@pytest.mark.slow
def test_full_iggt_converter_coverage():
    torch_ref.install_stubs()
    from iggt.models.vggt import IGGT as TIGGT

    from iggt_official_tpu.config import ModelConfig
    from iggt_official_tpu.models.vggt import IGGT
    from iggt_official_tpu.utils.torch_convert import (
        align_params,
        iggt_rename,
        torch_state_dict_to_flax,
    )

    tmodel = TIGGT()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    del tmodel

    cfg = dataclasses.replace(ModelConfig(), enable_track=True)
    model = IGGT(cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 28, 28, 3)).astype(np.float32))
    qp = jnp.asarray(rng.uniform(3, 25, (1, 4, 2)).astype(np.float32))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), imgs, qp)
    )["params"]
    params = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    loaded = torch_state_dict_to_flax(sd, rename=iggt_rename)
    _, report = align_params(params, loaded, log=None)
    assert report["shape_mismatch"] == []
    assert report["missing"] == []
    assert report["unused"] == []
    assert len(report["matched"]) > 2000
