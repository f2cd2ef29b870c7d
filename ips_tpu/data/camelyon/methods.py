"""WSI processing methods: HE grayscale, chunked Otsu, masks, tiling.

Behavioral parity with reference data/camelyon/cam_methods.py:
  * ``rgb2gray``: custom HE-stain grayscale r + b - (r+g+b)/1.5, clipped
    to [0, 255] (:30-49)
  * histogram Otsu over the exact value counts of the whole slide, read
    in width x step_size chunks (:81-126, 147-201)
  * connected-component foreground mask: threshold at t and 0.25 t, keep
    low-threshold components containing at least one high-threshold pixel
    (:51-79) — scipy.ndimage.label instead of skimage
  * tumor mask rasterized from annotation polygons (:203-255) — cv2
    fillPoly instead of skimage.draw.polygon
  * ``split_slide`` tile generator with foreground/tumor checks and the
    100-tumor-tile early exit (:257-357)
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np
from scipy import ndimage


def remove_alpha_channel(image: np.ndarray) -> np.ndarray:
    if image.ndim == 3 and image.shape[2] == 4:
        return image[:, :, :3]
    return image


def rgb2gray(rgb: np.ndarray) -> np.ndarray:
    """Custom HE-stain grayscale (reference cam_methods.py:30-49)."""
    rgb = rgb.astype(np.float64)
    gray = (1.0 * rgb[:, :, 0] + rgb[:, :, 2]
            - (1.0 * rgb[:, :, 0] + rgb[:, :, 1] + rgb[:, :, 2]) / 1.5)
    return np.clip(gray, 0, 255)


def otsu_by_hist(hist: np.ndarray, bin_centers: np.ndarray) -> float:
    """Otsu threshold from a histogram (reference cam_methods.py:81-126)."""
    hist = hist.astype(float)
    weight1 = np.cumsum(hist)
    weight2 = np.cumsum(hist[::-1])[::-1]
    with np.errstate(invalid="ignore", divide="ignore"):
        mean1 = np.cumsum(hist * bin_centers) / weight1
        mean2 = (np.cumsum((hist * bin_centers)[::-1])
                 / weight2[::-1])[::-1]
        variance12 = (weight1[:-1] * weight2[1:]
                      * (mean1[:-1] - mean2[1:]) ** 2)
    idx = np.nanargmax(variance12)
    return float(bin_centers[:-1][idx])


def create_otsu_mask_by_threshold(image: np.ndarray,
                                  threshold: float) -> np.ndarray:
    """Foreground mask keeping weak components attached to strong pixels
    (reference cam_methods.py:51-79).

    Deviation: the reference's loop `range(1, labels.max())` skips its
    highest-numbered component, unconditionally keeping it even without a
    strong pixel; here every component is checked.
    """
    strong = image > threshold
    weak = image > threshold * 0.25
    labeled, n = ndimage.label(weak)
    if n:
        # component ids containing at least one strong pixel
        has_strong = np.zeros(n + 1, bool)
        strong_ids = np.unique(labeled[strong])
        has_strong[strong_ids] = True
        has_strong[0] = False
        return has_strong[labeled].astype(np.uint8)
    return np.zeros_like(image, np.uint8)


def get_otsu_threshold(slide, level: int = 0, step_size: int = 1000) -> float:
    """Chunked whole-slide Otsu (reference cam_methods.py:147-201)."""
    size = slide.level_dimensions[0]
    downsample = slide.level_downsamples[level]
    counts: Dict[float, int] = {}
    for y in range(0, size[1], step_size):
        cur = min(step_size, size[1] - y)
        cut = (int(size[0] / downsample), int(cur / downsample))
        img = np.asarray(slide.read_region((0, y), level, cut))
        gray = rgb2gray(remove_alpha_channel(img))
        vals, cnts = np.unique(gray, return_counts=True)
        for v, c in zip(vals, cnts):
            counts[v] = counts.get(v, 0) + int(c)
    values = np.asarray(sorted(counts))
    hist = np.asarray([counts[v] for v in values])
    return otsu_by_hist(hist, values)


def create_tumor_mask(slide, level: int,
                      bounds: Optional[Tuple[Tuple[int, int],
                                             Tuple[int, int]]] = None
                      ) -> np.ndarray:
    """Rasterize annotation polygons (reference cam_methods.py:203-255).

    bounds: ((x, y) on level 0, (width, height) on `level`).
    """
    import cv2
    if bounds is None:
        start, size = (0, 0), slide.level_dimensions[level]
    else:
        start, size = bounds
    mask = np.zeros((size[1], size[0]), np.uint8)
    ds = slide.level_downsamples[level]
    polys = []
    for ann in slide.annotations:
        pts = np.asarray(ann.polygon, np.float64)          # (P, 2) = (x, y)
        pts[:, 0] = (pts[:, 0] - start[0]) / ds
        pts[:, 1] = (pts[:, 1] - start[1]) / ds
        polys.append(np.round(pts).astype(np.int32))
    if polys:
        cv2.fillPoly(mask, polys, 1)
    return mask


def split_slide(slide, lvl: int, otsu_threshold: float,
                fg_perc_thresh: float, tile_size: int, overlap: int,
                num_pos_tiles_threshold: int = 100
                ) -> Iterator[Tuple[np.ndarray,
                                    Tuple[Tuple[int, int],
                                          Tuple[int, int]]]]:
    """Yield (tile RGB, ((x, y), (w0, h0))) for foreground/tumor tiles
    (reference cam_methods.py:257-357)."""
    if tile_size <= overlap:
        raise ValueError("Overlap has to be smaller than the tile size.")
    if overlap < 0:
        raise ValueError("Overlap can not be negative.")
    if otsu_threshold < 0:
        raise ValueError("Otsu threshold can not be negative.")
    if not 0.0 <= fg_perc_thresh <= 1.0:
        raise ValueError("Foreground threshold has to be between 0 and 1")

    width0, height0 = slide.level_dimensions[0]
    downsample = slide.level_downsamples[lvl]
    tile_size0 = int(tile_size * downsample + 0.5)
    overlap0 = int(overlap * downsample + 0.5)
    min_fg_count = tile_size ** 2 * fg_perc_thresh

    num_pos_tiles = 0
    skip_pos_mask_calc = False

    for y in range(0, height0, tile_size0 - overlap0):
        if skip_pos_mask_calc or not slide.has_tumor:
            mask_row = None
            n_tumor_pixels_row = 0
        else:
            mask_row = create_tumor_mask(slide, lvl,
                                         ((0, y), (width0, tile_size)))
            n_tumor_pixels_row = int(mask_row.sum())

        for x in range(0, width0, tile_size0 - overlap0):
            if n_tumor_pixels_row > 0:
                if lvl == 0:
                    pos_count = int(mask_row[:, x:x + tile_size].sum())
                else:
                    tile_mask = create_tumor_mask(
                        slide, lvl, ((x, y), (tile_size, tile_size)))
                    pos_count = int(tile_mask.sum())
                if pos_count > 0:
                    num_pos_tiles += 1
                    if num_pos_tiles > num_pos_tiles_threshold:
                        skip_pos_mask_calc = True
            else:
                pos_count = 0

            tile = np.asarray(slide.read_region((x, y), lvl,
                                                (tile_size, tile_size)))
            fg = create_otsu_mask_by_threshold(
                rgb2gray(remove_alpha_channel(tile)), otsu_threshold)
            if fg.sum() >= min_fg_count or pos_count > 0:
                yield (remove_alpha_channel(tile),
                       ((x, y), (tile_size0, tile_size0)))
