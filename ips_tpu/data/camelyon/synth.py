"""Synthetic CAMELYON16-layout corpus generator (offline CLI).

The real CAMELYON16 corpus is ~700 GB of whole-slide TIFFs that cannot
exist in this environment, so the end-to-end image mode could only be
fixture-tested. This CLI fabricates a corpus in the exact CAMELYON16
directory layout the datamodel walks (slide.py:239-252; reference
datamodel.py:324-506):

    out_dir/training/normal/normal_XXX.png
    out_dir/training/tumor/tumor_XXX.png
    out_dir/training/lesion_annotations/tumor_XXX.xml   (ASAP polygons)
    out_dir/testing/images/test_XXX.png
    out_dir/testing/lesion_annotations/test_XXX.xml     (tumor tests only)

Slides are H&E-like: white glass with pink-purple tissue blobs; tumor
slides additionally carry a lesion region with dense dark "nuclei"
speckle, annotated by a matching ASAP polygon. The standard offline
pipeline (otsu CLI -> foreground CLI) and training CLI run UNMODIFIED
on the output — this is the corpus used for the multi-epoch
camelyon_e2e learning run in RESULTS.md.
"""

from __future__ import annotations

import argparse
import os
from os import path

import numpy as np

_ASAP_TPL = """<?xml version="1.0"?>
<ASAP_Annotations>
  <Annotations>
    <Annotation Name="_0" Type="Polygon" PartOfGroup="Tumor" Color="#F4FA58">
      <Coordinates>
{coords}
      </Coordinates>
    </Annotation>
  </Annotations>
</ASAP_Annotations>
"""


def _tissue_slide(rng: np.random.Generator, H: int, W: int) -> np.ndarray:
    """White glass + 2-4 elliptical pink-purple tissue blobs."""
    img = np.full((H, W, 3), 243, np.float32)
    ys = np.arange(H, dtype=np.float32)[:, None]
    xs = np.arange(W, dtype=np.float32)[None, :]
    for _ in range(rng.integers(2, 5)):
        cy, cx = rng.uniform(0.25, 0.75, 2) * (H, W)
        ry, rx = rng.uniform(0.18, 0.35, 2) * (H, W)
        blob = ((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2 <= 1.0
        tint = np.array([rng.uniform(175, 205), rng.uniform(120, 150),
                         rng.uniform(175, 205)], np.float32)
        img[blob] = tint + rng.normal(0, 8, 3).astype(np.float32)
    img += rng.normal(0, 4, img.shape).astype(np.float32)
    return img


def _add_lesion(img: np.ndarray, rng: np.random.Generator,
                contrast: float = 1.0):
    """Dense dark-nuclei speckle region; returns its polygon (x, y).

    ``contrast`` scales how visually distinct the lesion texture is
    (1.0 = the original, trivially separable look). Values around
    0.1-0.3 give a WEAK-signal corpus where test AUC plateaus below
    1.0 — the same trick the feature-mode head-to-head used
    (make_synth_features signal=0.55, RESULTS.md) so learning-curve
    comparisons measure generalization rather than saturation.
    """
    H, W = img.shape[:2]
    cy = rng.uniform(0.35, 0.65) * H
    cx = rng.uniform(0.35, 0.65) * W
    r = rng.uniform(0.12, 0.2) * min(H, W)
    ys = np.arange(H, dtype=np.float32)[:, None]
    xs = np.arange(W, dtype=np.float32)[None, :]
    lesion = (ys - cy) ** 2 + (xs - cx) ** 2 <= r * r
    # darker base + nuclei speckle (the learnable texture); both the
    # base blend and the speckle density/opacity scale with `contrast`
    a = 0.4 * contrast
    img[lesion] = (img[lesion] * (1 - a)
                   + np.array([90, 40, 110], np.float32) * a)
    nuclei = (rng.random((H, W)) < 0.25 * contrast) & lesion
    cn = min(1.0, 0.25 + 0.75 * contrast)
    img[nuclei] = (img[nuclei] * (1 - cn)
                   + np.array([60, 20, 80], np.float32) * cn)
    poly = [(cx + r * np.cos(t), cy + r * np.sin(t))
            for t in np.linspace(0, 2 * np.pi, 12, endpoint=False)]
    return poly


def _write_xml(fpath: str, poly) -> None:
    coords = "\n".join(
        f'        <Coordinate Order="{i}" X="{x:.1f}" Y="{y:.1f}"/>'
        for i, (x, y) in enumerate(poly))
    with open(fpath, "w") as f:
        f.write(_ASAP_TPL.format(coords=coords))


def generate_synth_camelyon(out_dir: str, n_normal: int = 8,
                            n_tumor: int = 8, n_test: int = 8,
                            height: int = 768, width: int = 768,
                            seed: int = 0, contrast: float = 1.0,
                            contrast_min: float = None) -> None:
    """Write a CAMELYON16-layout synthetic corpus.

    ``contrast_min``: when set, each tumor slide draws its own contrast
    ~ U(contrast_min, contrast) instead of the fixed value. With
    contrast_min near 0 some slides are unrankable BY CONSTRUCTION
    (their lesion is below the slide noise floor), so test AUC plateaus
    strictly below 1.0 no matter how well the model trains — the
    image-mode analog of the feature head-to-head's weak-signal corpus
    (make_synth_features signal=0.55, RESULTS.md).
    """
    from PIL import Image
    rng = np.random.default_rng(seed)

    def draw_contrast() -> float:
        if contrast_min is None:
            return contrast
        return float(rng.uniform(contrast_min, contrast))
    dirs = {
        "normal": path.join(out_dir, "training/normal"),
        "tumor": path.join(out_dir, "training/tumor"),
        "train_ann": path.join(out_dir, "training/lesion_annotations"),
        "test": path.join(out_dir, "testing/images"),
        "test_ann": path.join(out_dir, "testing/lesion_annotations"),
    }
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    def save(img: np.ndarray, fpath: str) -> None:
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(fpath)

    for i in range(n_normal):
        save(_tissue_slide(rng, height, width),
             path.join(dirs["normal"], f"normal_{i:03d}.png"))
    for i in range(n_tumor):
        img = _tissue_slide(rng, height, width)
        poly = _add_lesion(img, rng, draw_contrast())
        name = f"tumor_{i:03d}"
        save(img, path.join(dirs["tumor"], f"{name}.png"))
        _write_xml(path.join(dirs["train_ann"], f"{name}.xml"), poly)
    for i in range(n_test):
        img = _tissue_slide(rng, height, width)
        name = f"test_{i:03d}"
        if i % 2 == 1:            # odd test slides carry tumor
            poly = _add_lesion(img, rng, draw_contrast())
            _write_xml(path.join(dirs["test_ann"], f"{name}.xml"), poly)
        save(img, path.join(dirs["test"], f"{name}.png"))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Generate a synthetic CAMELYON16-layout corpus")
    p.add_argument("--n_normal", type=int, default=8)
    p.add_argument("--n_tumor", type=int, default=8)
    p.add_argument("--n_test", type=int, default=8)
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=768)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--contrast", type=float, default=1.0,
                   help="lesion texture strength; ~0.1-0.3 gives a "
                        "weak-signal corpus (AUC plateaus < 1.0)")
    p.add_argument("--contrast_min", type=float, default=None,
                   help="when set, each tumor slide draws contrast ~ "
                        "U(contrast_min, contrast); near-0 draws make "
                        "some slides unrankable so AUC caps below 1.0 "
                        "by construction")
    p.add_argument("output_directory")
    a = p.parse_args(argv)
    generate_synth_camelyon(a.output_directory, a.n_normal, a.n_tumor,
                            a.n_test, a.height, a.width, a.seed, a.contrast,
                            a.contrast_min)
    print(f"wrote synthetic CAMELYON16 corpus to {a.output_directory}")


if __name__ == "__main__":
    main()
