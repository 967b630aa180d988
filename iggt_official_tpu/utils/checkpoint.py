"""Checkpoint save/load: orbax natively, PyTorch ``.pth`` via the converter.

Behavioural parity: the reference's inference-side loading
(`demo.py:102-121` + `utils/model.py:27-55`): torch.load, strip the DDP
``module.`` prefix, shape-checked intersection merge with matched /
mismatched / missing / unused reporting, ``strict=False`` semantics.
Training-side (`iggt/datasets/utils/misc.py:295-333`): model + optimizer +
step in one checkpoint — covered by saving the whole TrainState pytree.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (params or TrainState contents) with orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Load an orbax checkpoint (optionally restoring into `target`'s
    structure/shardings)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def load_torch_checkpoint(
    path: str,
    target_params: Dict,
    log=print,
) -> Tuple[Dict, Dict]:
    """Load a reference PyTorch checkpoint into flax params.

    Mirrors `demo.py:113-116`: torch.load -> strip ``module.`` ->
    rename/convert -> shape-aligned partial merge (strict=False).
    Returns (merged params, report).
    """
    import torch

    from iggt_official_tpu.utils.torch_convert import (
        align_params,
        iggt_rename,
        strip_module_prefix,
        torch_state_dict_to_flax,
    )

    state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "model" in state:
        state = state["model"]
    state = strip_module_prefix(
        {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
         for k, v in state.items()}
    )
    loaded = torch_state_dict_to_flax(state, rename=iggt_rename)
    return align_params(target_params, loaded, log=log)
