"""Convert reference PyTorch state dicts into flax parameter trees.

The flax modules in this package deliberately reuse the reference's
submodule names (qkv, proj, norm1, ls1, mlp.fc1, blocks.N -> blocks_N, ...),
so conversion is a mechanical rule set:

- path: split on '.', merge pure-digit components into the previous one
  (``blocks.3.attn`` -> ``blocks_3/attn``).
- Linear ``weight`` (ndim 2)          -> ``kernel``, transposed.
- LayerNorm/BatchNorm ``weight``      -> ``scale``.
- Conv2d ``weight`` (ndim 4)          -> ``kernel`` (kh, kw, in, out).
- ConvTranspose2d ``weight``          -> ``kernel``: flip spatial dims then
  (in, out, kh, kw) -> (kh, kw, in, out)   [torch layout is (in, out, kh, kw)]
- BatchNorm ``running_mean/var``      -> ``mean`` / ``var``.
- everything else (gamma, bias, *_token, pos_embed, rpb tables) copies.

Checkpoint loading mirrors `demo.py:113-116` + `utils/model.py:27-55`:
strip a leading ``module.``, intersect by name, drop shape mismatches with a
log line, and report unmatched keys.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Iterable, Optional, Set, Tuple

import numpy as np

TensorDict = Dict[str, np.ndarray]

# torch parameter names whose ndim-4 weight belongs to a ConvTranspose2d
# (flip + (I,O,kh,kw)->(kh,kw,I,O)) rather than a Conv2d.  Matched on the
# *suffix-free* module path via regex, AFTER `iggt_rename` is applied.
_CONVTRANSPOSE_PATTERNS = [
    # DPTHead / GeoProjector resize layers 0 and 1 (`dpt_head.py:87-96`,
    # `adaptor.py:71-84`) — with or without a model-level prefix
    r"(^|\.)resize_[01]$",
    # SamProjector resize pyramid upsample stages (`adaptor.py:152-171`)
    r"resize_0_up[12]$",
    r"resize_1_up$",
]


def is_conv_transpose(path: str) -> bool:
    return any(re.search(p, path) for p in _CONVTRANSPOSE_PATTERNS)


# Rules mapping reference module paths onto this package's flax module
# names.  Each is (regex, replacement) applied with re.sub; a None
# replacement drops the parameter (dead weights / index buffers).
_RENAME_RULES: Tuple[Tuple[str, Optional[str]], ...] = (
    # dead inherited DPT front-end in PartHead (`part_head.py:30,206-218`)
    (r"^(.*\.)?part_head\.(norm|projects|resize_layers)\..*$", None),
    # precomputed window-attention index buffers — rebuilt statically here
    (r".*relative_position_index.*$", None),
    # DPT scratch container is flattened away (`dpt_head.py:100-128`)
    (r"\.scratch\.", "."),
    # DPT resize pyramid (`dpt_head.py:85-98`)
    (r"\.resize_layers\.([0-3])$", r".resize_\1"),
    # CameraHead Sequential(SiLU, Linear) (`camera_head.py:72`)
    (r"\.poseLN_modulation\.1$", ".poseLN_modulation"),
    # SamProjector resize stages (`adaptor.py:152-175`); Projects internals
    # extend these paths, hence the lookahead instead of an anchor
    (r"\.resize_layers\.0\.0(?=\.|$)", ".resize_0_up1"),
    (r"\.resize_layers\.0\.1(?=\.|$)", ".resize_0_proj1"),
    (r"\.resize_layers\.0\.2(?=\.|$)", ".resize_0_up2"),
    (r"\.resize_layers\.0\.3(?=\.|$)", ".resize_0_proj2"),
    (r"\.resize_layers\.1\.0(?=\.|$)", ".resize_1_up"),
    (r"\.resize_layers\.1\.1(?=\.|$)", ".resize_1_proj"),
    (r"\.resize_layers\.2\.1(?=\.|$)", ".resize_2_proj"),
    (r"\.resize_layers\.3\.0(?=\.|$)", ".resize_3_down"),
    (r"\.resize_layers\.3\.1(?=\.|$)", ".resize_3_proj"),
    # Projects block internals (`adaptor.py:12-26`)
    (r"\.input_proj\.0$", ".input_proj_conv"),
    (r"\.input_proj\.1$", ".input_proj_bn"),
    (r"\.residual_conv\.0$", ".res_conv1"),
    (r"\.residual_conv\.1$", ".res_bn1"),
    (r"\.residual_conv\.3$", ".res_conv2"),
    (r"\.residual_conv\.4$", ".res_bn2"),
    # DINOv2 mask_token is unused at inference (`vision_transformer.py`)
    (r"^(.*\.)?patch_embed\.mask_token$", None),
    # Swin wrappers (`window_sa.py:321-545`) — everywhere EXCEPT the DINOv2
    # ViT patch embed (`aggregator.patch_embed.norm` is its final LayerNorm)
    (r"(?<!aggregator)\.patch_embed\.norm$", ".patch_norm"),
    (r"\.atten_block\.attn\.qkv$", ".atten_block.attn_qkv"),
    (r"\.atten_block\.attn\.proj$", ".atten_block.attn_proj"),
    (r"\.conv_block\.cab\.0$", ".conv_block.conv1"),
    (r"\.conv_block\.cab\.2$", ".conv_block.conv2"),
    (r"\.conv_block\.cab\.3\.attention\.1$", ".conv_block.ca.fc1"),
    (r"\.conv_block\.cab\.3\.attention\.3$", ".conv_block.ca.fc2"),
    (r"\.conv_before_upsample\.0$", ".conv_before_upsample"),
    # tracker Sequential heads (`base_track_predictor.py:75-81`)
    (r"\.ffeat_updater\.0$", ".ffeat_updater"),
    (r"\.vis_predictor\.0$", ".vis_predictor"),
    (r"\.conf_predictor\.0$", ".conf_predictor"),
    # DPT output_conv2 Sequential indices merge to _0/_2 automatically
)


def iggt_rename(name: str) -> Optional[str]:
    """Default rename for full IGGT/VGGT checkpoints (applied per module
    path, leaf kept).  Returns None for parameters we deliberately drop."""
    parts = name.rsplit(".", 1)
    module_path, leaf = (parts[0], parts[1]) if len(parts) == 2 else ("", parts[0])
    # guard rules that match whole names (drops)
    probe = f".{module_path}" if module_path else ""
    for pattern, repl in _RENAME_RULES:
        if repl is None:
            if re.match(pattern, name):
                return None
            continue
        probe = re.sub(pattern, repl, probe)
    new_module = probe[1:] if probe.startswith(".") else probe
    return f"{new_module}.{leaf}" if new_module else leaf


# ---------------------------------------------------------------------------
# SAM2 checkpoint conversion (released sam2_hiera_*.pt / sam2.1_*.pt files;
# module layout from `sam2/modeling/sam2_base.py` and friends).

_SAM2_RENAME_RULES: Tuple[Tuple[str, str], ...] = (
    # FpnNeck convs are direct ImageEncoder children here
    # (`backbones/image_encoder.py:39-80`)
    (r"image_encoder\.neck\.convs\.(\d+)\.conv\.", r"image_encoder.neck_convs_\1."),
    (r"\.trunk\.patch_embed\.proj\.", ".trunk.patch_embed_proj."),
    # memory encoder fuser (`memory_encoder.py`)
    (r"memory_encoder\.fuser\.layers\.(\d+)\.", r"memory_encoder.fuser_layers_\1."),
    # high-res skip convs live on SAM2Base, not the decoder
    # (`sam2_base.py:230-240` creates them there; ours keeps them top-level)
    (r"^sam_mask_decoder\.conv_s([01])\.", r"conv_s\1."),
    # prompt encoder mask_downscaling Sequential (`sam/prompt_encoder.py:40-50`)
    (r"\.mask_downscaling\.0\.", ".mask_conv1."),
    (r"\.mask_downscaling\.1\.", ".mask_ln1."),
    (r"\.mask_downscaling\.3\.", ".mask_conv2."),
    (r"\.mask_downscaling\.4\.", ".mask_ln2."),
    (r"\.mask_downscaling\.6\.", ".mask_conv3."),
    # nn.Embedding tables become plain params (drop the .weight leaf)
    (r"\.(iou_token|mask_tokens|obj_score_token)\.weight$", r".\1"),
)

_SAM2_CONVTRANSPOSE_PATTERNS = [
    # MaskDecoder.output_upscaling stages 0 and 2 (`sam/mask_decoder.py`)
    r"output_upscaling\.[03]$",
]


def sam2_rename(name: str) -> Optional[str]:
    for pattern, repl in _SAM2_RENAME_RULES:
        name = re.sub(pattern, repl, name)
    return name


def sam2_state_dict_to_flax(state_dict: TensorDict) -> Dict:
    """Convert a released SAM2 torch checkpoint into this package's flax
    params tree (`SAM2Base.init_all` structure).

    Handles the handful of layout changes beyond the generic rules:
    NCHW backbone pos embeds -> HWC, squeezed prompt-encoder embedding
    tables, the stacked ``point_embeddings`` ModuleList, and the squeezed
    ``maskmem_tpos_enc``.
    """
    sd = dict(strip_module_prefix(state_dict))
    if "model" in sd and not hasattr(sd["model"], "ndim"):
        sd = dict(sd["model"])  # released ckpts wrap the weights

    specials: Dict[Tuple[str, ...], np.ndarray] = {}

    def pop(name):
        return np.asarray(sd.pop(name))

    for key in ("pos_embed", "pos_embed_window"):
        full = f"image_encoder.trunk.{key}"
        if full in sd:  # (1, C, H, W) -> (H, W, C)
            specials[("image_encoder", "trunk", key)] = np.ascontiguousarray(
                pop(full)[0].transpose(1, 2, 0)
            )
    if "maskmem_tpos_enc" in sd:  # (M, 1, 1, D) -> (M, 1, D)
        specials[("maskmem_tpos_enc",)] = pop("maskmem_tpos_enc")[:, 0]
    for key in ("no_mask_embed", "not_a_point_embed"):
        full = f"sam_prompt_encoder.{key}.weight"
        if full in sd:  # (1, C) -> (C,)
            specials[("sam_prompt_encoder", key)] = pop(full)[0]
    pts = [
        f"sam_prompt_encoder.point_embeddings.{i}.weight" for i in range(4)
    ]
    if all(p in sd for p in pts):  # 4x (1, C) -> (4, C)
        specials[("sam_prompt_encoder", "point_embeddings")] = np.concatenate(
            [pop(p) for p in pts], axis=0
        )

    def is_ct(path):
        return any(re.search(p, path) for p in _SAM2_CONVTRANSPOSE_PATTERNS)

    tree = torch_state_dict_to_flax(
        sd, rename=sam2_rename, conv_transpose_paths=is_ct
    )
    flat = flatten_tree(tree)
    flat.update(specials)
    return unflatten_tree(flat)


def _merge_digits(parts: Iterable[str]) -> Tuple[str, ...]:
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return tuple(out)


def torch_name_to_flax_path(
    name: str, ndim: int, conv_transpose: bool = False
) -> Tuple[Tuple[str, ...], Callable[[np.ndarray], np.ndarray]]:
    """Map a torch parameter name to (flax path, array transform)."""
    parts = name.split(".")
    leaf = parts[-1]
    prefix = _merge_digits(parts[:-1])

    identity = lambda a: a
    if leaf == "weight":
        if ndim == 2:
            return prefix + ("kernel",), lambda a: np.ascontiguousarray(a.T)
        if ndim == 4:
            if conv_transpose:
                return prefix + ("kernel",), lambda a: np.ascontiguousarray(
                    a[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
                )
            return prefix + ("kernel",), lambda a: np.ascontiguousarray(
                a.transpose(2, 3, 1, 0)
            )
        if ndim == 1:
            return prefix + ("scale",), identity
        raise ValueError(f"unhandled weight ndim {ndim} for {name}")
    if leaf == "running_mean":
        return prefix + ("mean",), identity
    if leaf == "running_var":
        return prefix + ("var",), identity
    if leaf == "num_batches_tracked":
        return (), identity  # dropped
    return _merge_digits(parts), identity


def torch_state_dict_to_flax(
    state_dict: TensorDict,
    rename: Optional[Callable[[str], Optional[str]]] = None,
    conv_transpose_paths: Optional[Callable[[str], bool]] = None,
) -> Dict:
    """Convert a full torch state dict into a nested flax params dict.

    ``rename`` maps torch names to new torch-style names (return None to
    drop).  ``conv_transpose_paths`` overrides ConvTranspose detection.
    """
    is_ct = conv_transpose_paths or is_conv_transpose
    tree: Dict = {}
    for name, value in state_dict.items():
        if rename is not None:
            name2 = rename(name)
            if name2 is None:
                continue
            name = name2
        arr = np.asarray(value)
        module_path = ".".join(name.split(".")[:-1])
        path, transform = torch_name_to_flax_path(
            name, arr.ndim, conv_transpose=is_ct(module_path)
        )
        if not path:
            continue
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = transform(arr)
    return tree


def strip_module_prefix(state_dict: TensorDict) -> TensorDict:
    """DDP 'module.' prefix strip (`demo.py:114`)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def flatten_tree(tree: Dict, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], np.ndarray]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(flatten_tree(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def unflatten_tree(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for key in path[:-1]:
            node = node.setdefault(key, {})
        node[path[-1]] = v
    return tree


def align_params(
    target: Dict, loaded: Dict, log: Optional[Callable[[str], None]] = print
) -> Tuple[Dict, Dict[str, list]]:
    """Shape-checked intersection merge, like `utils/model.py:27-55`.

    Returns (merged params matching `target`'s structure, report dict with
    'matched' / 'shape_mismatch' / 'missing' / 'unused' name lists).
    """
    tgt = flatten_tree(target)
    src = flatten_tree(loaded)
    report = {"matched": [], "shape_mismatch": [], "missing": [], "unused": []}
    merged = {}
    for path, tval in tgt.items():
        name = "/".join(path)
        if path in src:
            sval = src[path]
            if tuple(np.shape(sval)) == tuple(np.shape(tval)):
                merged[path] = np.asarray(sval, dtype=np.asarray(tval).dtype)
                report["matched"].append(name)
            else:
                merged[path] = tval
                report["shape_mismatch"].append(
                    f"{name}: ckpt{np.shape(sval)} vs model{np.shape(tval)}"
                )
        else:
            merged[path] = tval
            report["missing"].append(name)
    for path in src:
        if path not in tgt:
            report["unused"].append("/".join(path))
    if log is not None:
        log(
            f"align_params: {len(report['matched'])} matched, "
            f"{len(report['shape_mismatch'])} shape-mismatched, "
            f"{len(report['missing'])} missing, {len(report['unused'])} unused"
        )
        for line in report["shape_mismatch"]:
            log(f"  SHAPE MISMATCH {line}")
    return unflatten_tree(merged), report
