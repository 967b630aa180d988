"""Measure the heuristic sky segmenter against hand-annotated goldens.

VERDICT r2 missing #1 / item 9: the reference masks sky in GLB export with
a trained ONNX model (`visual_util.py:112-159`); this build substitutes a
first-party heuristic (`utils/sky.py`).  Neither onnxruntime nor the
skyseg.onnx weights exist in this image (zero egress), so a direct
model-vs-model diff is impossible.  This script substitutes the next best
thing: HUMAN-annotated golden masks on the demo scenes' outdoor images
(conservative definite-sky / definite-non-sky regions with a wide
don't-care band along skylines, plus gradient-carved don't-care over thin
structures — wires, poles, railings), and all-non-sky goldens on three
indoor images (false-positive probes: bright white walls connected to the
top border are exactly the heuristic's failure bait).

Golden encoding (PNG, uint8): 0 = sky, 255 = non-sky, 128 = don't-care.

Run:  python benchmarks/measure_sky.py [--regen]
  --regen rebuilds tests/data/sky_golden/*.png from the box specs below
  (they are checked in; regeneration is deterministic).
Writes benchmarks/sky_deltas.json; tests/test_utils_misc.py asserts the
accuracy floors so a heuristic regression fails the default suite.
"""

from __future__ import annotations

import argparse
import json
import os.path as op
import sys

import numpy as np
import PIL.Image

sys.path.insert(0, op.join(op.dirname(op.abspath(__file__)), ".."))

DEMO = "/root/reference/iggt_demo"
GOLDEN_DIR = op.join(op.dirname(op.abspath(__file__)), "..", "tests", "data",
                     "sky_golden")

# Hand annotations (2026-08, from gridded visual inspection at 2x zoom).
# Boxes are (x0, x1, y0, y1), half-open.  "sky" boxes sit well above the
# skyline; "nonsky" boxes sit well below it; everything else defaults to
# don't-care.  Pole/railing spans are simply left out of the sky boxes;
# wires are removed by the gradient carve (they are thin, high-contrast).
ANNOTATIONS = {
    # demo1: overcast SF street, sky above rooflines/tree, wires everywhere
    "demo1/images/059ea665922dfdc543d7bdfba8da1a96.jpg": {
        "sky": [(0, 183, 0, 30), (218, 270, 0, 35), (270, 300, 0, 100),
                (300, 410, 0, 35), (410, 478, 0, 100), (498, 512, 0, 100)],
        "nonsky": [(0, 512, 160, 341), (0, 175, 75, 160),
                   (310, 400, 70, 160)],
    },
    "demo1/images/2096ab3582533634fe162b9a47ae21ab.jpg": {
        "sky": [(0, 140, 0, 30), (285, 478, 0, 100), (498, 512, 0, 100)],
        "nonsky": [(0, 512, 200, 341), (0, 140, 60, 200),
                   (150, 280, 20, 200)],
    },
    "demo1/images/c636b1bbcaa1163de0b0ad0e73fa35fa.jpg": {
        "sky": [(0, 60, 0, 20), (82, 225, 0, 25), (235, 325, 0, 22),
                (330, 450, 0, 100), (472, 512, 0, 100)],
        "nonsky": [(0, 512, 180, 341), (0, 220, 65, 180),
                   (240, 320, 60, 180)],
    },
    # demo5: blown-out white sky over apartment rooflines (tests the
    # overcast/white-sky branch); far-left is ambiguous -> don't-care
    "demo5/images/00011_3.jpg": {
        "sky": [(100, 200, 0, 130), (200, 285, 0, 55)],
        "nonsky": [(0, 512, 230, 341), (310, 512, 60, 341),
                   (115, 290, 220, 341)],
    },
    # indoor negatives: zero sky anywhere; bright walls/ceilings at the
    # top border are the heuristic's false-positive bait
    "demo9/images/00000.jpg": {"sky": [], "nonsky": "all"},
    "demo4/images/1.png": {"sky": [], "nonsky": "all"},
    "demo7/images/sample_06_frame_72.jpg": {"sky": [], "nonsky": "all"},
}


def _edge_carve(img: np.ndarray, golden: np.ndarray, thresh=0.06, pad=2):
    """Mark don't-care over thin high-contrast structures inside the
    definite-sky region (wires/antennas the boxes could not exclude)."""
    lum = np.asarray(img, np.float32).mean(-1) / 255.0
    gy = np.abs(np.diff(lum, axis=0, prepend=lum[:1]))
    gx = np.abs(np.diff(lum, axis=1, prepend=lum[:, :1]))
    edge = (gx + gy) > thresh
    for _ in range(pad):  # dilate
        e = edge.copy()
        e[1:] |= edge[:-1]
        e[:-1] |= edge[1:]
        e[:, 1:] |= edge[:, :-1]
        e[:, :-1] |= edge[:, 1:]
        edge = e
    golden[(golden == 0) & edge] = 128
    return golden


def build_goldens() -> None:
    import os

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for rel, spec in ANNOTATIONS.items():
        img = np.asarray(PIL.Image.open(op.join(DEMO, rel)).convert("RGB"))
        h, w = img.shape[:2]
        if spec["nonsky"] == "all":
            golden = np.full((h, w), 255, np.uint8)
        else:
            golden = np.full((h, w), 128, np.uint8)
            for x0, x1, y0, y1 in spec["nonsky"]:
                golden[y0:y1, x0:x1] = 255
            for x0, x1, y0, y1 in spec["sky"]:
                golden[y0:y1, x0:x1] = 0
            golden = _edge_carve(img, golden)
        name = rel.replace("/images/", "__").replace("/", "_")
        name = op.splitext(name)[0] + ".png"
        PIL.Image.fromarray(golden).save(op.join(GOLDEN_DIR, name))
        print("wrote", name, f"sky_px={int((golden == 0).sum())}",
              f"nonsky_px={int((golden == 255).sum())}")


# ----------------------------------------------------------------------
# Photometric variants (round 4, VERDICT item 8): the demo scenes contain
# no sunset/night imagery and the image has zero egress, so the extended
# golden set is built by DETERMINISTIC photometric transforms of the
# annotated images — the golden masks are unchanged (geometry is).  These
# probe the documented failure modes (warm skies break the cool-tint
# requirement, dark skies break the brightness floor) and turn the warm
# indoor negatives into harder false-positive bait.
# ----------------------------------------------------------------------


def _sunset(img: np.ndarray) -> np.ndarray:
    """Warm golden-hour grade: channel gains + vertical warm ramp."""
    x = np.asarray(img, np.float32) / 255.0
    h = x.shape[0]
    ramp = np.linspace(1.0, 0.75, h, dtype=np.float32)[:, None, None]
    x = x * np.asarray([1.18, 0.92, 0.62], np.float32)
    x = x * (0.92 * ramp + (1 - ramp) * 0.85)
    # lift the top region's red a touch (sunset glow)
    glow = np.linspace(0.08, 0.0, h, dtype=np.float32)[:, None]
    x[..., 0] = x[..., 0] + glow
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def _night(img: np.ndarray) -> np.ndarray:
    """Exposure drop + mild blue cast + deterministic sensor noise."""
    x = np.asarray(img, np.float32) / 255.0
    x = np.power(x, 1.4) * 0.22
    x = x * np.asarray([0.85, 0.92, 1.1], np.float32)
    rng = np.random.default_rng(0)
    x = x + rng.normal(0, 0.008, x.shape).astype(np.float32)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def _overcast(img: np.ndarray) -> np.ndarray:
    """Desaturate + lift toward white (flat grey-sky grade)."""
    x = np.asarray(img, np.float32) / 255.0
    lum = x.mean(-1, keepdims=True)
    x = 0.35 * x + 0.65 * lum          # desaturate
    x = x + (1.0 - x) * 0.25           # lift
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def _warm_night(img: np.ndarray) -> np.ndarray:
    """Moonless light-polluted night (round 5): exposure drop + WARM
    sodium-lamp cast + sensor noise — the documented night-branch miss
    (the r4 branch required a blue cast), and warm bait for the indoor
    negatives."""
    x = np.asarray(img, np.float32) / 255.0
    x = np.power(x, 1.4) * 0.20
    x = x * np.asarray([1.15, 0.95, 0.72], np.float32)
    rng = np.random.default_rng(1)
    x = x + rng.normal(0, 0.008, x.shape).astype(np.float32)
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


VARIANTS = {"orig": None, "sunset": _sunset, "night": _night,
            "overcast": _overcast, "warm_night": _warm_night}


def _skyfill(img: np.ndarray, golden: np.ndarray):
    """Upward-tilt reframe (round 5, geometric): keep the top 30% rows and
    resize back to full height, so real sky reaches the frame bottom — a
    low-horizon / sky-dominant shot (the annotated sky boxes extend to
    ~y=0.3h, so after this reframe predicted sky must cross the bottom
    fifth, exercising the dominance exemption).  The r4 vertical-extent
    filter rejected ANY top component with >2% mass in the bottom fifth,
    which zeroed the whole mask on such frames (ADVICE r4).  The golden
    is cropped/resized identically (nearest keeps the 0/128/255
    coding)."""
    h, w = img.shape[:2]
    cut = max(1, int(0.30 * h))
    im2 = np.asarray(PIL.Image.fromarray(img[:cut]).resize(
        (w, h), PIL.Image.Resampling.BILINEAR))
    g2 = np.asarray(PIL.Image.fromarray(golden[:cut]).resize(
        (w, h), PIL.Image.Resampling.NEAREST))
    # the interpolated skyline band is uncertain — widen don't-care by a
    # few rows around any sky/nonsky transition
    edge = np.zeros_like(g2, bool)
    diff = g2[1:] != g2[:-1]
    edge[1:] |= diff
    edge[:-1] |= diff
    for _ in range(3):
        e = edge.copy()
        e[1:] |= edge[:-1]
        e[:-1] |= edge[1:]
        edge = e
    g2 = g2.copy()
    g2[edge] = 128
    return im2, g2


GEO_VARIANTS = {"skyfill": _skyfill}


def evaluate() -> dict:
    from iggt_official_tpu.utils.sky import segment_sky_heuristic

    per_image = {}
    for rel in ANNOTATIONS:
        name = rel.replace("/images/", "__").replace("/", "_")
        name = op.splitext(name)[0] + ".png"
        golden0 = np.asarray(PIL.Image.open(op.join(GOLDEN_DIR, name)))
        base = np.asarray(PIL.Image.open(op.join(DEMO, rel)).convert("RGB"))
        cases = [(variant, base if tf is None else tf(base), golden0)
                 for variant, tf in VARIANTS.items()]
        for gname, gtf in GEO_VARIANTS.items():
            img_g, golden_g = gtf(base, golden0)
            cases.append((gname, img_g, golden_g))
            # geometric + warm-night composition: sky-dominant AND dark
            img_gn, golden_gn = gtf(_warm_night(base), golden0)
            cases.append((f"{gname}_warm_night", img_gn, golden_gn))
        for variant, img, golden in cases:
            pred_keep = segment_sky_heuristic(img)  # 255=keep, 0=sky
            pred_sky = pred_keep == 0
            gt_sky, gt_non = golden == 0, golden == 255
            tp = int((pred_sky & gt_sky).sum())
            fn = int((~pred_sky & gt_sky).sum())
            fp = int((pred_sky & gt_non).sum())
            tn = int((~pred_sky & gt_non).sum())
            key = name if variant == "orig" else f"{variant}:{name}"
            per_image[key] = {
                "sky_recall": round(tp / max(tp + fn, 1), 4)
                if gt_sky.any() else None,
                "sky_precision": round(tp / max(tp + fp, 1), 4)
                if (tp + fp) else None,
                "fp_rate_nonsky": round(fp / max(fp + tn, 1), 4),
                "scored_px": int(tp + fn + fp + tn),
            }
            print(key, per_image[key])

    def agg(variant):
        rows = [v for k, v in per_image.items()
                if (k.split(":")[0] == variant if ":" in k
                    else variant == "orig")]
        pos = [v["sky_recall"] for v in rows if v["sky_recall"] is not None]
        return {
            "mean_sky_recall": round(float(np.mean(pos)), 4),
            "mean_fp_rate_nonsky": round(float(np.mean(
                [v["fp_rate_nonsky"] for v in rows])), 4),
        }

    all_variants = (list(VARIANTS) + [g for g in GEO_VARIANTS]
                    + [f"{g}_warm_night" for g in GEO_VARIANTS])
    out = {
        "per_image": per_image,
        "by_variant": {v: agg(v) for v in all_variants},
        "note": "goldens are conservative hand annotations with don't-care "
                "skyline bands; sunset/night/overcast rows are deterministic "
                "photometric variants of the same frames (no real "
                "sunset/night imagery exists in this zero-egress image); "
                "the trained reference model is unavailable",
    }
    # keep the headline keys for the original frames (test floors read them)
    out["mean_sky_recall"] = out["by_variant"]["orig"]["mean_sky_recall"]
    out["mean_fp_rate_nonsky"] = (
        out["by_variant"]["orig"]["mean_fp_rate_nonsky"])
    with open(op.join(op.dirname(op.abspath(__file__)), "sky_deltas.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_image"}))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    args = ap.parse_args()
    if args.regen or not op.isdir(GOLDEN_DIR):
        build_goldens()
    evaluate()
