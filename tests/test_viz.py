"""Annotation overlay visualization helpers."""

import numpy as np

from ips_tpu.data.camelyon.slide import Annotation, ArraySlide, Slide
from ips_tpu.data.camelyon.viz import (annotation_boundaries,
                                       annotation_image, draw_polygon,
                                       get_relative_polygon)


def _slide():
    s = Slide("s", "unused")
    s._reader = ArraySlide(np.full((400, 400, 3), 200, np.uint8))
    return s


def _ann():
    return Annotation("a", "Polygon", "Tumor", "#F4FA58",
                      [(100.0, 120.0), (250.0, 120.0), (250.0, 300.0),
                       (100.0, 300.0)])


def test_relative_polygon():
    poly = get_relative_polygon([(10, 20), (30, 40)], (10, 20), 2.0)
    assert poly == ((0.0, 0.0), (10.0, 10.0))


def test_boundaries():
    origin, size = annotation_boundaries(_ann(), _slide(), level=0,
                                         padding=10)
    assert origin == (90, 110)
    assert size == (170, 200)   # (250-90+10, 300-110+10)


def test_boundaries_downsampled():
    _, size = annotation_boundaries(_ann(), _slide(), level=1)
    assert size == (75, 90)


def test_annotation_image_renders():
    img = annotation_image(_ann(), _slide(), level=0, padding=20)
    arr = np.asarray(img)
    assert arr.shape[2] == 4
    # interior darkened by the fill overlay vs untouched corner
    assert arr[:, :, :3][arr.shape[0] // 2, arr.shape[1] // 2].mean() \
        < arr[0, 0, :3].mean()


def test_draw_polygon_outline():
    from PIL import Image
    base = Image.new("RGB", (50, 50), (255, 255, 255))
    out = draw_polygon(base, [(10, 10), (40, 10), (40, 40)],
                       fill=(0, 0, 0, 120), outline="#FF0000")
    arr = np.asarray(out)
    assert (arr[10, 20, :3] == [255, 0, 0]).all()   # outline pixel
