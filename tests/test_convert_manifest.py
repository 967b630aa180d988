"""Structural converter coverage on every run (no torch build).

`tests/data/iggt_state_dict_manifest.json` is the exact (name, shape) list
of the reference IGGT state dict (2053 entries, generated from
`/root/reference/iggt/models/vggt.py` IGGT()).  This test fabricates int8
dummies of those shapes, runs the full rename+layout conversion, and checks
the result covers the flax IGGT param tree (full-scale config, shapes via
`jax.eval_shape` — no real weights) with no missing / unused / mismatched
slots.  It is the fast, always-on version of
tests/test_convert_full.py::test_full_iggt_converter_coverage (slow-marked,
builds the real 1.3B-param torch model).
"""

import dataclasses
import json
import os.path as op

import numpy as np
import jax
import jax.numpy as jnp

from iggt_official_tpu.config import ModelConfig
from iggt_official_tpu.models.vggt import IGGT
from iggt_official_tpu.utils.torch_convert import (
    align_params,
    iggt_rename,
    torch_state_dict_to_flax,
)

MANIFEST = op.join(op.dirname(__file__), "data", "iggt_state_dict_manifest.json")


def test_manifest_converter_coverage():
    with open(MANIFEST) as f:
        manifest = json.load(f)
    assert len(manifest) > 2000

    sd = {name: np.zeros(shape, np.int8) for name, shape in manifest}

    cfg = dataclasses.replace(ModelConfig(), enable_track=True)
    model = IGGT(cfg)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 28, 28, 3)).astype(np.float32))
    qp = jnp.asarray(rng.uniform(3, 25, (1, 4, 2)).astype(np.float32))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), imgs, qp)
    )["params"]
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.int8), shapes)

    loaded = torch_state_dict_to_flax(sd, rename=iggt_rename)
    _, report = align_params(params, loaded, log=None)
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:20]
    assert report["missing"] == [], report["missing"][:20]
    assert report["unused"] == [], report["unused"][:20]
    assert len(report["matched"]) > 2000
