"""Visualizer, prompt templates, class vocabularies, SAM-v1 transforms,
AverageMeter."""

import numpy as np

from iggt_official_tpu.sam2.transforms import ResizeLongestSide
from iggt_official_tpu.utils.constants import (
    ADE150_CLASSES,
    CITYSCAPES_CLASSES,
    COCO_PANOPTIC_CLASSES,
    COCO_THING_CLASSES,
    PASCAL_VOC_CLASSES,
    SCANNET20_CLASSES,
)
from iggt_official_tpu.utils.logging import AverageMeter
from iggt_official_tpu.utils.prompt_engineering import (
    get_prompt_templates,
    prompt_engineering,
)
from iggt_official_tpu.utils.visualizer import Visualizer, instance_color


def test_visualizer_draws_instances_and_labels():
    img = np.full((48, 64, 3), 128, np.uint8)
    masks = np.zeros((2, 48, 64), bool)
    masks[0, 5:20, 5:30] = True
    masks[1, 25:45, 30:60] = True
    vis = Visualizer(img)
    out = vis.draw_instances(masks, labels=["chair", "table"], scores=[0.9, 0.8])
    assert out.shape == img.shape and out.dtype == np.uint8
    # mask interiors changed, background untouched
    assert (out[10, 10] != img[10, 10]).any()
    assert (out[0, 0] == img[0, 0]).all()

    out2 = Visualizer(img).draw_sem_seg(
        np.where(masks[0], 3, 255), class_names=["a", "b", "c", "wall"]
    )
    assert (out2[10, 10] != img[10, 10]).any()

    out3 = Visualizer(img).draw_panoptic_seg(
        np.where(masks[1], 7, 0), [{"id": 7, "category_name": "sofa"}]
    )
    assert (out3[30, 40] != img[30, 40]).any()

    boxed = Visualizer(img).draw_box((5, 5, 30, 20), color=(255, 0, 0))
    assert (boxed[5, 5:31] == (255, 0, 0)).all()


def test_instance_colors_distinct():
    cols = {tuple(instance_color(i)) for i in range(30)}
    assert len(cols) >= 28


def test_prompt_templates():
    t = get_prompt_templates()
    assert len(t) >= 60 and all("{}" in s for s in t)
    np.random.seed(0)
    out = prompt_engineering("sofa", topk=1)
    assert out == "sofa."
    out = prompt_engineering(["arm chair"], topk=1, suffix=":")
    assert out == "arm chair:"


def test_class_vocabularies():
    assert len(COCO_THING_CLASSES) == 80
    assert len(COCO_PANOPTIC_CLASSES) == 133
    assert len(ADE150_CLASSES) == 150
    assert len(PASCAL_VOC_CLASSES) == 21
    assert len(CITYSCAPES_CLASSES) == 19
    assert len(SCANNET20_CLASSES) == 20
    for vocab in (COCO_PANOPTIC_CLASSES, ADE150_CLASSES):
        assert len(set(vocab)) == len(vocab)


def test_resize_longest_side():
    t = ResizeLongestSide(128)
    assert t.get_preprocess_shape(100, 200, 128) == (64, 128)
    img = np.zeros((100, 200, 3), np.uint8)
    assert t.apply_image(img).shape == (64, 128, 3)
    coords = t.apply_coords(np.array([[200.0, 100.0]]), (100, 200))
    np.testing.assert_allclose(coords, [[128.0, 64.0]])
    boxes = t.apply_boxes(np.array([[0.0, 0.0, 200.0, 100.0]]), (100, 200))
    np.testing.assert_allclose(boxes, [[0.0, 0.0, 128.0, 64.0]])


def test_average_meter_matches_reference_semantics():
    m = AverageMeter()
    m.update(2.0)
    m.update(4.0)
    assert m.avg == 3.0 and m.count == 2
    # exponential decay branch
    import math

    d = AverageMeter()
    d.update(1.0, n=1, decay=100)
    alpha = math.exp(-1 / 100)
    assert abs(d.sum - (1 - alpha) * 1.0) < 1e-12
    assert abs(d.avg - 1.0) < 1e-12
