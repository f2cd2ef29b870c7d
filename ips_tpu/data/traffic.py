"""Swedish Traffic Signs (STS) dataset: download, filter, augment, patchify.

Behavioral parity with the reference pipeline
(reference data/traffic/traffic_dataset.py:19-348):

  * auto-download of Set1/Set2 zips + md5-checked annotation files
    (:19-120) — this build environment has no network egress, so the
    download path raises a clear error when files are missing;
  * Set choice by ``(seed + 1 + train) % 2`` (:196);
  * annotation parsing into Sign records with visibility ordering
    VISIBLE < BLURRED < SIDE_ROAD < OCCLUDED, ties by larger area (:122-182);
  * class filter: EMPTY / 50_SIGN / 70_SIGN / 80_SIGN, keeping only images
    whose most-visible speed-limit sign is VISIBLE (:263-321);
  * resize to 1200x1600; train-time color jitter (0.1 each) + random
    translation (up to 100 px); ImageNet mean/std normalization (:275-290);
  * patchify (:337-343) — here channels-last via the shared numpy unfold.
"""

from __future__ import annotations

import hashlib
import os
from os import path
from typing import Dict, List, NamedTuple, Tuple

import numpy as np

from ips_tpu.data.loader import Dataset
from ips_tpu.data.patchify import patchify

SET1_ANNOT_MD5 = "9106a905a86209c95dc9b51d12f520d6"
SET2_ANNOT_MD5 = "09debbc67f6cd89c1e2a2688ad1d03ca"
SET1_URL = ("http://www.isy.liu.se/cvl/research/trafficSigns"
            "/swedishSignsSummer/Set1/Set1Part0.zip")
SET2_URL = ("http://www.isy.liu.se/cvl/research/trafficSigns"
            "/swedishSignsSummer/Set2/Set2Part0.zip")

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

VISIBILITIES = ["VISIBLE", "BLURRED", "SIDE_ROAD", "OCCLUDED"]


def file_md5_ok(filepath: str, md5sum: str) -> bool:
    try:
        md5 = hashlib.md5()
        with open(filepath, "rb") as f:
            while chunk := f.read(1 << 16):
                md5.update(chunk)
        return md5.hexdigest() == md5sum
    except FileNotFoundError:
        return False


def ensure_dataset_exists(directory: str, allow_download: bool = True) -> None:
    ok = (file_md5_ok(path.join(directory, "Set1", "annotations.txt"),
                      SET1_ANNOT_MD5)
          and file_md5_ok(path.join(directory, "Set2", "annotations.txt"),
                          SET2_ANNOT_MD5))
    if ok:
        return
    if not allow_download:
        raise FileNotFoundError(
            f"STS dataset not found/corrupt under {directory}. "
            f"Download Set1/Set2 from {SET1_URL} / {SET2_URL} plus their "
            "annotations.txt files and unzip into Set1/ and Set2/.")
    import urllib.request
    import zipfile
    for name, url in (("Set1", SET1_URL), ("Set2", SET2_URL)):
        os.makedirs(path.join(directory, name), exist_ok=True)
        zip_path = path.join(directory, f"{name}.zip")
        urllib.request.urlretrieve(url, zip_path)
        with zipfile.ZipFile(zip_path) as z:
            z.extractall(path.join(directory, name))
        annot_url = url.rsplit("/", 1)[0] + "/annotations.txt"
        urllib.request.urlretrieve(
            annot_url, path.join(directory, name, "annotations.txt"))
    if not (file_md5_ok(path.join(directory, "Set1", "annotations.txt"),
                        SET1_ANNOT_MD5)
            and file_md5_ok(path.join(directory, "Set2", "annotations.txt"),
                            SET2_ANNOT_MD5)):
        raise RuntimeError("STS download is corrupted (md5 mismatch)")


class Sign(NamedTuple):
    visibility: str
    bbox: Tuple[float, float, float, float]  # (x_max, y_max, x_min, y_min)
    type: str
    name: str

    @property
    def area(self) -> float:
        x_max, y_max, x_min, y_min = self.bbox
        return (x_max - x_min) * (y_max - y_min)

    @property
    def visibility_index(self) -> int:
        return VISIBILITIES.index(self.visibility)

    def sort_key(self):
        # More visible first; among equal visibility, larger area first
        # (reference traffic_dataset.py:174-182).
        return (self.visibility_index, -self.area)


def _parse_float(x: str) -> float:
    # Annotation numbers occasionally carry trailing junk characters;
    # the reference strips them one at a time (traffic_dataset.py:208-219).
    while x:
        try:
            return float(x)
        except ValueError:
            x = x[:-1]
    raise ValueError("unparseable bbox number")


def parse_annotations(annot_path: str) -> List[Tuple[str, List[Sign]]]:
    """annotations.txt -> [(image filename, [Sign, ...])]."""
    with open(annot_path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    out = []
    for ln in lines:
        fname, rest = ln.split(":", 1)
        signs = []
        for part in rest.split(";"):
            part = part.strip()
            if not part:
                continue
            fields = [s.strip() for s in part.split(",")]
            if fields[0] == "MISC_SIGNS" or len(fields) < 7:
                continue
            signs.append(Sign(
                visibility=fields[0],
                bbox=tuple(_parse_float(v) for v in fields[1:5]),
                type=fields[5],
                name=fields[6]))
        out.append((fname, signs))
    return out


class STS:
    """Reads one of the annotation sets; set choice mirrors the reference
    ``Set{1 + ((seed + 1 + train) % 2)}`` (traffic_dataset.py:196)."""

    def __init__(self, directory: str, train: bool = True, seed: int = 0,
                 allow_download: bool = False):
        ensure_dataset_exists(directory, allow_download)
        inner = f"Set{1 + ((seed + 1 + int(train)) % 2)}"
        records = parse_annotations(path.join(directory, inner,
                                              "annotations.txt"))
        self._data = [(path.join(directory, inner, fname), signs)
                      for fname, signs in records]

    def __len__(self):
        return len(self._data)

    def __getitem__(self, i):
        return self._data[i]

    def __iter__(self):
        return iter(self._data)


LIMITS = ["50_SIGN", "70_SIGN", "80_SIGN"]
CLASSES = ["EMPTY", *LIMITS]
IMG_SIZE = (1200, 1600)  # (H, W)


def filter_sts(data) -> List[Tuple[str, int]]:
    """Keep EMPTY images and images whose top speed-limit sign is VISIBLE
    (reference traffic_dataset.py:292-321)."""
    filtered = []
    for image, signs in data:
        if not signs:
            filtered.append((image, 0))
            continue
        limits = sorted((s for s in signs if s.name in LIMITS),
                        key=Sign.sort_key)
        if not limits:
            continue  # other signs present but no speed limit -> drop
        if limits[0].visibility != "VISIBLE":
            continue
        filtered.append((image, CLASSES.index(limits[0].name)))
    return filtered


# -- augmentations (numpy/PIL re-implementations of the torchvision ops) ----

def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 amount: float = 0.1) -> np.ndarray:
    """Brightness/contrast/saturation/hue jitter, factor U(1-a, 1+a)
    (hue shift U(-a, a)); img float32 (H, W, 3) in [0, 1]."""
    # brightness
    img = img * rng.uniform(1 - amount, 1 + amount)
    # contrast (around the mean gray)
    mean = img.mean()
    img = (img - mean) * rng.uniform(1 - amount, 1 + amount) + mean
    # saturation (toward/away from per-pixel gray)
    gray = img @ np.array([0.299, 0.587, 0.114], np.float32)
    img = ((img - gray[..., None]) * rng.uniform(1 - amount, 1 + amount)
           + gray[..., None])
    # hue: rotate channels in YIQ-ish space (cheap approximation)
    theta = rng.uniform(-amount, amount) * np.pi
    cos_t, sin_t = np.cos(theta), np.sin(theta)
    yiq_from_rgb = np.array([[0.299, 0.587, 0.114],
                             [0.596, -0.274, -0.322],
                             [0.211, -0.523, 0.312]], np.float32)
    rgb_from_yiq = np.linalg.inv(yiq_from_rgb)
    rot = np.array([[1, 0, 0],
                    [0, cos_t, -sin_t],
                    [0, sin_t, cos_t]], np.float32)
    m = rgb_from_yiq @ rot @ yiq_from_rgb
    img = img @ m.T
    return np.clip(img, 0.0, 1.0)


def random_translate(img: np.ndarray, rng: np.random.Generator,
                     max_dx: int = 100, max_dy: int = 100) -> np.ndarray:
    """RandomAffine(degrees=0, translate=...) equivalent: integer shift
    with zero fill (reference traffic_dataset.py:282)."""
    dy = int(rng.integers(-max_dy, max_dy + 1))
    dx = int(rng.integers(-max_dx, max_dx + 1))
    H, W = img.shape[:2]
    h, w = H - abs(dy), W - abs(dx)
    out = np.zeros_like(img)
    src_y0, src_x0 = max(0, -dy), max(0, -dx)
    dst_y0, dst_x0 = max(0, dy), max(0, dx)
    out[dst_y0:dst_y0 + h, dst_x0:dst_x0 + w] = \
        img[src_y0:src_y0 + h, src_x0:src_x0 + w]
    return out


class TrafficSigns(Dataset):
    """Filtered STS images -> normalized NHWC patches + class label."""

    def __init__(self, conf, train: bool = True, allow_download: bool = False):
        import itertools
        self.patch_size = conf.patch_size
        self.patch_stride = conf.patch_stride
        self.tasks = conf.task_list
        self.train = train
        self.seed = conf.seed
        # per-__getitem__ generators (a shared np Generator is not
        # thread-safe under the threaded loader); the counter varies the
        # augmentation across epochs like the reference's global torch RNG
        self._draw = itertools.count()
        self._data = filter_sts(STS(conf.data_dir, train, conf.seed,
                                    allow_download=allow_download))

    def __len__(self):
        return len(self._data)

    def _load_image(self, fpath: str) -> np.ndarray:
        from PIL import Image
        img = Image.open(fpath).convert("RGB")
        img = img.resize((IMG_SIZE[1], IMG_SIZE[0]), Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        fpath, category = self._data[i]
        img = self._load_image(fpath)
        if self.train:
            rng = np.random.default_rng([self.seed, i, next(self._draw)])
            img = color_jitter(img, rng)
            img = random_translate(img, rng)
        img = (img - IMAGENET_MEAN) / IMAGENET_STD
        patches = patchify(img.astype(np.float32), self.patch_size,
                           self.patch_stride)
        out = {"input": patches}
        for t in self.tasks:
            out[t.name] = np.int64(category)
        return out
