"""SAM2 subsystem: CCL, position embeddings, Hiera/FPN, predictors."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from iggt_official_tpu.ops.connected_components import (
    connected_components,
    fill_holes_in_mask_scores,
    mask_to_box,
)
from iggt_official_tpu.sam2.base import SAM2Base
from iggt_official_tpu.sam2.build import build_sam2
from iggt_official_tpu.sam2.common import PositionEmbeddingSine
from iggt_official_tpu.sam2.config import SAM2Config
from iggt_official_tpu.sam2.image_predictor import SAM2ImagePredictor
from iggt_official_tpu.sam2.memory import axial_rope_tables, apply_rotary
from iggt_official_tpu.sam2.video_predictor import SAM2VideoPredictor

from . import torch_ref


def test_connected_components_matches_scipy():
    from scipy import ndimage

    rng = np.random.default_rng(0)
    m = rng.random((2, 32, 40)) < 0.4
    labels, areas = connected_components(jnp.asarray(m))
    labels, areas = np.asarray(labels), np.asarray(areas)
    s8 = np.ones((3, 3), int)
    for b in range(2):
        ref, n = ndimage.label(m[b], structure=s8)
        for comp in range(1, n + 1):
            sel = ref == comp
            assert len(np.unique(labels[b][sel])) == 1
            assert (areas[b][sel] == sel.sum()).all()
        assert (labels[b][~m[b]] == 0).all()
        # distinct components get distinct labels
        fg_labels = [labels[b][ref == c][0] for c in range(1, n + 1)]
        assert len(set(fg_labels)) == n


def test_fill_holes_and_mask_to_box():
    scores = np.full((1, 16, 16), 5.0, np.float32)
    scores[0, 8, 8] = -1.0  # 1-pixel hole
    filled = np.asarray(fill_holes_in_mask_scores(jnp.asarray(scores), 4))
    assert filled[0, 8, 8] == pytest.approx(0.1)

    m = np.zeros((1, 16, 16), bool)
    m[0, 2:5, 3:9] = True
    box = np.asarray(mask_to_box(jnp.asarray(m)))
    assert tuple(box[0]) == (3, 2, 8, 4)


def test_position_embedding_sine_parity(ref):
    import torch
    from sam2.modeling.position_encoding import PositionEmbeddingSine as TRef

    tpe = TRef(num_pos_feats=64, warmup_cache=False)
    with torch.no_grad():
        refv = tpe._pe(1, torch.device("cpu"), 6, 9).numpy()  # (1, C, H, W)
    mine = np.asarray(PositionEmbeddingSine(64)(6, 9))  # (H, W, C)
    np.testing.assert_allclose(
        mine.transpose(2, 0, 1)[None], refv, rtol=1e-5, atol=1e-5
    )


@pytest.fixture(scope="module")
def ref():
    return torch_ref.iggt_modules()


def test_axial_rope_parity(ref):
    import torch
    from sam2.modeling.position_encoding import apply_rotary_enc, compute_axial_cis

    torch.manual_seed(0)
    dim, ex, ey = 16, 4, 4
    cis = compute_axial_cis(dim, ex, ey, theta=10000.0)
    q = torch.randn(1, 2, ex * ey, dim)
    k = torch.randn(1, 2, ex * ey, dim)
    with torch.no_grad():
        qr, kr = apply_rotary_enc(q, k, cis)

    cos, sin = axial_rope_tables(dim, ex, ey)
    mq = apply_rotary(jnp.asarray(q.numpy()), cos[None, None], sin[None, None])
    mk = apply_rotary(jnp.asarray(k.numpy()), cos[None, None], sin[None, None])
    np.testing.assert_allclose(np.asarray(mq), qr.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mk), kr.numpy(), rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def tiny_sam():
    cfg = SAM2Config().scaled(image_size=64)
    return build_sam2(cfg)


def test_image_predictor_end_to_end(tiny_sam):
    model, variables = tiny_sam
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    pred.set_image(image)
    masks, ious, low = pred.predict(
        point_coords=np.array([[32.0, 24.0]]),
        point_labels=np.array([1]),
        multimask_output=True,
    )
    assert masks.shape == (3, 48, 64) and masks.dtype == bool
    assert ious.shape == (3,)
    assert np.isfinite(low).all()

    # box prompt path
    masks2, _, _ = pred.predict(box=np.array([8, 8, 56, 40]),
                                multimask_output=False)
    assert masks2.shape == (1, 48, 64)


def test_video_predictor_propagation(tiny_sam):
    model, variables = tiny_sam
    pred = SAM2VideoPredictor(model, variables)
    rng = np.random.default_rng(1)
    frames = [
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(4)
    ]
    state = pred.init_state(frames)
    fidx, obj_ids, mask = pred.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.array([[30.0, 20.0]]), labels=np.array([1]),
    )
    assert fidx == 0 and obj_ids == [1]
    assert mask.shape[-2:] == (48, 64)

    outs = list(pred.propagate_in_video(state))
    assert [f for f, _, _ in outs] == [0, 1, 2, 3]
    for _, ids, masks in outs:
        assert ids == [1]
        assert masks.shape == (1, 48, 64)
        assert np.isfinite(masks).all()
    # memory grows: later frames conditioned on earlier outputs
    assert len(state["non_cond_frame_outputs"][1]) == 3


def test_video_propagation_scan_matches_streaming(tiny_sam):
    """The whole-video lax.scan path reproduces the per-frame streaming
    loop (same memory-bank/pointer selection) for the single-cond-frame
    VOS protocol, including multi-object batching."""
    model, variables = tiny_sam
    rng = np.random.default_rng(2)
    frames = [
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(5)
    ]

    def run(method_name):
        pred = SAM2VideoPredictor(model, variables)
        state = pred.init_state(frames)
        pred.add_new_points_or_box(
            state, frame_idx=0, obj_id=1,
            points=np.array([[30.0, 20.0]]), labels=np.array([1]),
        )
        pred.add_new_points_or_box(
            state, frame_idx=0, obj_id=2,
            points=np.array([[10.0, 40.0]]), labels=np.array([1]),
        )
        outs = list(getattr(pred, method_name)(state))
        return outs, state

    stream_outs, _ = run("propagate_in_video")
    batch_outs, batch_state = run("propagate_in_video_batch")

    assert [f for f, _, _ in batch_outs] == [f for f, _, _ in stream_outs]
    for (f, ids_s, m_s), (_, ids_b, m_b) in zip(stream_outs, batch_outs):
        assert ids_s == ids_b == [1, 2]
        assert m_b.shape == m_s.shape
        np.testing.assert_allclose(
            np.asarray(m_b), np.asarray(m_s), rtol=1e-4, atol=2e-4,
        )
    # bookkeeping matches the streaming layout so later interactions work
    nc = batch_state["non_cond_frame_outputs"][1]
    assert sorted(nc) == [1, 2, 3, 4]
    assert np.asarray(nc[2]["obj_ptr"]).ndim == 1


def test_video_propagation_batch_fallback(tiny_sam):
    """Prompts on different frames don't fit the scan pattern: the batch
    API must fall back to the streaming loop and still yield every frame."""
    model, variables = tiny_sam
    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(3)
    ]
    pred = SAM2VideoPredictor(model, variables)
    state = pred.init_state(frames)
    pred.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.array([[30.0, 20.0]]), labels=np.array([1]),
    )
    pred.add_new_points_or_box(
        state, frame_idx=1, obj_id=2,
        points=np.array([[10.0, 40.0]]), labels=np.array([1]),
    )
    outs = list(pred.propagate_in_video_batch(state))
    assert [f for f, _, _ in outs] == [0, 1, 2]


def test_amg_helpers():
    from iggt_official_tpu.sam2.amg import (
        area_from_rle,
        batched_mask_to_box,
        build_point_grid,
        calculate_stability_score,
        mask_to_rle,
        nms_boxes,
        rle_to_mask,
    )

    grid = build_point_grid(4)
    assert grid.shape == (16, 2)
    assert grid.min() > 0 and grid.max() < 1

    rng = np.random.default_rng(0)
    mask = rng.random((12, 17)) < 0.3
    rle = mask_to_rle(mask)
    np.testing.assert_array_equal(rle_to_mask(rle), mask)
    assert area_from_rle(rle) == mask.sum()

    m = np.zeros((2, 8, 8), bool)
    m[0, 1:4, 2:6] = True
    boxes = batched_mask_to_box(m)
    assert tuple(boxes[0]) == (2, 1, 5, 3)
    assert tuple(boxes[1]) == (0, 0, 0, 0)

    logits = np.zeros((1, 6, 6), np.float32) - 5
    logits[0, 1:5, 1:5] = 5.0
    s = calculate_stability_score(logits, 0.0, 1.0)
    assert s[0] == 1.0

    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float32)
    keep = nms_boxes(boxes, np.array([0.9, 0.8, 0.7]), iou_thresh=0.5)
    assert keep == [0, 2]


def test_amg_generate(tiny_sam):
    from iggt_official_tpu.sam2.amg import SAM2AutomaticMaskGenerator

    model, variables = tiny_sam
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(2)
    image = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    amg = SAM2AutomaticMaskGenerator(
        pred, points_per_side=4, pred_iou_thresh=0.0,
        stability_score_thresh=0.0,
    )
    results = amg.generate(image)
    assert len(results) > 0
    r = results[0]
    assert r["segmentation"].shape == (48, 64)
    assert set(r) >= {"segmentation", "area", "bbox", "predicted_iou",
                      "stability_score", "point_coords"}


def test_amg_crop_helpers():
    """Crop sweep geometry (`sam2/utils/amg.py:196-260`): layered boxes,
    uncrop round-trips, crop-edge filtering."""
    from iggt_official_tpu.sam2.amg import (
        build_all_layer_point_grids,
        generate_crop_boxes,
        is_box_near_crop_edge,
        uncrop_boxes_xyxy,
        uncrop_masks,
        uncrop_points,
    )

    boxes, layers = generate_crop_boxes((60, 90), n_layers=1,
                                        overlap_ratio=0.3)
    # full image + 2x2 crops
    assert boxes[0] == [0, 0, 90, 60] and layers == [0, 1, 1, 1, 1]
    assert len(boxes) == 5
    for x0, y0, x1, y1 in boxes[1:]:
        assert 0 <= x0 < x1 <= 90 and 0 <= y0 < y1 <= 60
    # neighbouring crops overlap
    assert boxes[1][2] > boxes[3][0] and boxes[1][3] > boxes[2][1]

    grids = build_all_layer_point_grids(8, 1, 2)
    assert grids[0].shape == (64, 2) and grids[1].shape == (16, 2)

    crop = [10, 20, 50, 44]
    m = np.zeros((24, 40), bool)
    m[2:5, 3:9] = True
    un = uncrop_masks(m, crop, 60, 90)
    assert un.shape == (60, 90) and un[22:25, 13:19].all() and un.sum() == m.sum()
    np.testing.assert_array_equal(
        uncrop_boxes_xyxy(np.array([[3, 2, 9, 5]]), crop),
        [[13, 22, 19, 25]])
    np.testing.assert_array_equal(
        uncrop_points(np.array([[3, 2]]), crop), [[13, 22]])

    # a box on the crop's interior edge is a fragment; one on the image
    # edge is not
    crop = [0, 0, 50, 60]
    frag = np.array([[30, 10, 50, 20]])     # touches x1=50 (interior)
    edge = np.array([[0, 10, 20, 20]])      # touches x0=0 (image edge)
    assert is_box_near_crop_edge(frag, crop, [0, 0, 90, 60]).tolist() == [True]
    assert is_box_near_crop_edge(edge, crop, [0, 0, 90, 60]).tolist() == [False]


def test_amg_generate_multicrop(tiny_sam):
    """crop_n_layers=1: the sweep runs 5 crops, dedups across them with
    smaller-crop preference, and records each mask's crop_box
    (`automatic_mask_generator.py:217-243`)."""
    from iggt_official_tpu.sam2.amg import SAM2AutomaticMaskGenerator

    model, variables = tiny_sam
    pred = SAM2ImagePredictor(model, variables)
    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    amg = SAM2AutomaticMaskGenerator(
        pred, points_per_side=4, pred_iou_thresh=0.0,
        stability_score_thresh=0.0, crop_n_layers=1,
        crop_n_points_downscale_factor=2,
    )
    results = amg.generate(image)
    assert len(results) > 0
    crop_boxes = {tuple(r["crop_box"]) for r in results}
    assert all(len(cb) == 4 for cb in crop_boxes)
    for r in results:
        assert r["segmentation"].shape == (48, 64)
        x, y, w, h = r["bbox"]
        assert 0 <= x <= 64 and 0 <= y <= 48


def _write_jpeg_frames(tmp_path, n=5, hw=(48, 64), seed=2):
    import cv2

    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        frames.append(img)
        cv2.imwrite(
            str(tmp_path / f"{i:05d}.jpg"),
            cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, 95],
        )
    return frames


def test_video_io_jpeg_dir_sources(tmp_path):
    """JPEG-dir ingestion (sync + async) matches the ndarray path
    (ref `sam2/utils/misc.py:98-270`)."""
    from iggt_official_tpu.sam2.transforms import SAM2Transforms
    from iggt_official_tpu.sam2.video_io import load_frame_source

    _write_jpeg_frames(tmp_path)
    tr = SAM2Transforms(64, 0.0, 0.0, 0.0)

    sync = load_frame_source(str(tmp_path), tr)
    assert sync.num_frames == 5 and tuple(sync.orig_hw) == (48, 64)
    async_src = load_frame_source(
        str(tmp_path), tr, async_loading_frames=True, chunk=2
    )
    assert async_src.num_frames == 5
    assert tuple(async_src.orig_hw) == (48, 64)
    for i in (0, 3, 4, 1):  # out-of-order access blocks per chunk
        np.testing.assert_allclose(
            np.asarray(async_src.get(i)), np.asarray(sync.get(i)), atol=1e-6
        )


def test_video_io_mp4(tmp_path):
    import cv2

    from iggt_official_tpu.sam2.transforms import SAM2Transforms
    from iggt_official_tpu.sam2.video_io import load_frame_source

    path = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 5.0, (64, 48)
    )
    if not vw.isOpened():
        pytest.skip("cv2 mp4 encoder unavailable")
    rng = np.random.default_rng(3)
    for _ in range(4):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()

    tr = SAM2Transforms(64, 0.0, 0.0, 0.0)
    src = load_frame_source(path, tr)
    assert src.num_frames == 4 and tuple(src.orig_hw) == (48, 64)
    assert np.isfinite(np.asarray(src.get(2))).all()


def test_video_predictor_from_jpeg_dir(tiny_sam, tmp_path):
    """VOS runnable straight from a frame directory (async decode)."""
    model, variables = tiny_sam
    pred = SAM2VideoPredictor(model, variables)
    frames = _write_jpeg_frames(tmp_path, n=4)

    state = pred.init_state(str(tmp_path), async_loading_frames=True)
    assert state["num_frames"] == 4
    pred.add_new_points_or_box(
        state, frame_idx=0, obj_id=1,
        points=np.array([[30.0, 20.0]]), labels=np.array([1]),
    )
    outs = list(pred.propagate_in_video(state))
    assert [f for f, _, _ in outs] == [0, 1, 2, 3]
    for _, ids, masks in outs:
        assert masks.shape == (1, 48, 64) and np.isfinite(masks).all()
