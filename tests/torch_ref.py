"""Import the reference PyTorch implementation (CPU) for parity testing.

The reference at /root/reference has several heavyweight/unavailable deps
(detectron2, basicsr, hydra, xformers, apex).  None of them are on the actual
numeric path we compare against, so we register minimal stubs before import.

Usage:
    ref = pytest.importorskip("tests.torch_ref")  # or plain import
    agg = ref.iggt_modules().Aggregator(...)
"""

from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"

_installed = False


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs():
    """Register stub modules for the reference's unavailable dependencies."""
    global _installed
    if _installed:
        return
    import torch
    import torch.nn as nn

    class ShapeSpec:
        def __init__(self, channels=None, stride=None):
            self.channels, self.stride = channels, stride

    _stub("detectron2")
    _stub("detectron2.layers", ShapeSpec=ShapeSpec)

    class RMSNorm(nn.Module):
        # matches apex FusedRMSNorm semantics (rsqrt of mean square * weight)
        def __init__(self, d, eps=1e-6, elementwise_affine=True):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(d))
            self.eps = eps

        def forward(self, x):
            var = x.float().pow(2).mean(-1, keepdim=True)
            return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) * self.weight

    _stub("src")
    _stub("src.model")
    _stub("src.model.norm", RMSNorm=RMSNorm)

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(t, std=1.0, **kw):
        return torch.nn.init.trunc_normal_(t, std=std)

    _stub("basicsr")
    _stub("basicsr.archs")
    _stub("basicsr.archs.arch_util", to_2tuple=to_2tuple, trunc_normal_=trunc_normal_)

    class _TVF(types.ModuleType):
        def __getattr__(self, name):
            def factory(*a, **k):
                return lambda x: x
            return factory

    sys.modules["torchvision"] = types.ModuleType("torchvision")
    sys.modules["torchvision.transforms"] = _TVF("torchvision.transforms")
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]

    _stub("huggingface_hub", PyTorchModelHubMixin=object)
    if "transformers" not in sys.modules:
        # the real transformers is importable but slow; a stub is enough
        _stub("transformers", Mask2FormerConfig=object)

    class _GH:
        @classmethod
        def instance(cls):
            return types.SimpleNamespace(is_initialized=lambda: True)

    _stub("hydra", initialize_config_module=lambda *a, **k: None,
          compose=lambda *a, **k: None)
    _stub("hydra.core")
    _stub("hydra.core.global_hydra", GlobalHydra=_GH)

    # evo (trajectory eval), torch_geometric/torch_scatter (KNN), cuml: only
    # needed by modules we don't compare against numerically.
    _stub("evo")
    _stub("evo.main_ape", ape=None)
    _stub("evo.main_rpe", rpe=None)
    _stub("evo.core", sync=types.SimpleNamespace())
    _stub("evo.core.sync")
    _stub("evo.core.metrics", PoseRelation=object, Unit=object)
    _stub("evo.core.trajectory", PosePath3D=object, PoseTrajectory3D=object)
    _stub("evo.tools", file_interface=None, plot=None)
    _stub("evo.tools.plot")
    _stub("evo.tools.file_interface")
    _stub("torch_geometric")
    _stub("torch_geometric.nn", knn_graph=None)
    _stub("torch_scatter", scatter_mean=None)
    _stub("hdbscan", HDBSCAN=None)
    # dataset-module imports we don't compare against numerically
    _stub("pycocotools")
    _stub("pycocotools.mask", decode=None, encode=None)
    _stub("infinibatch")
    _stub("infinibatch.iterators")
    _stub("h5py")
    _stub("imageio")
    _stub("imageio.v2")

    # visual_util.py top-level imports (GLB/app glue we don't compare against)
    class _Anything:
        def __getattr__(self, name):
            return _Anything()

        def __call__(self, *a, **k):
            return _Anything()

    trimesh_stub = _stub("trimesh")
    trimesh_stub.Scene = _Anything
    trimesh_stub.PointCloud = _Anything
    trimesh_stub.Trimesh = _Anything
    trimesh_stub.creation = _Anything()
    trimesh_stub.transformations = _Anything()
    _stub("gradio")
    _stub("requests")
    _stub("onnxruntime")

    # sam2 backbone imports (file IO manager; unused on the numeric path)
    _stub("iopath")
    _stub("iopath.common")
    _stub("iopath.common.file_io", g_pathmgr=_Anything())

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _installed = True


def iggt_modules():
    """Import and return the reference `iggt` package (stubs installed)."""
    install_stubs()
    import iggt  # noqa: F401

    return sys.modules["iggt"]


def torch_to_numpy(t):
    return t.detach().cpu().numpy()
