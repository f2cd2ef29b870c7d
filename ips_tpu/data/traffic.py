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

# single source of truth, shared with the on-device path (ips_net.py)
from ips_tpu.utils.imagenet import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402

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
    if path.exists(path.join(directory, "SYNTHETIC")):
        # Corpus from ips_tpu.data.traffic_synth: same layout, no md5 gate.
        if (path.exists(path.join(directory, "Set1", "annotations.txt"))
                and path.exists(path.join(directory, "Set2",
                                          "annotations.txt"))):
            return
        raise FileNotFoundError(
            f"synthetic STS marker present but annotations missing under "
            f"{directory}")
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

_GRAY_WEIGHTS = np.array([0.2989, 0.587, 0.114], np.float32)


def _rgb_to_hsv(img: np.ndarray):
    """(H, W, 3) float [0,1] -> (h, s, v) planes; torchvision convention
    (h = 0 for achromatic pixels)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = img.max(axis=-1)
    minc = img.min(axis=-1)
    cr = maxc - minc
    ones = np.ones_like(maxc)
    s = cr / np.where(maxc == 0, ones, maxc)
    crd = np.where(cr == 0, ones, cr)
    rc = (maxc - r) / crd
    gc = (maxc - g) / crd
    bc = (maxc - b) / crd
    h = np.where(r == maxc, bc - gc,
                 np.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    return h, s, maxc


def _hsv_to_rgb(h: np.ndarray, s: np.ndarray, v: np.ndarray) -> np.ndarray:
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(np.int32) % 6
    rgb = np.stack([
        np.choose(i, [v, q, p, p, t, v]),
        np.choose(i, [t, v, v, q, p, p]),
        np.choose(i, [p, p, t, v, v, q]),
    ], axis=-1)
    return rgb.astype(np.float32)


def _adjust_hue(img: np.ndarray, factor: float) -> np.ndarray:
    """torchvision F.adjust_hue: exact HSV hue rotation by `factor` turns."""
    h, s, v = _rgb_to_hsv(img)
    return _hsv_to_rgb((h + factor) % 1.0, s, v)


def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 amount: float = 0.1) -> np.ndarray:
    """Exact torchvision ``ColorJitter(a, a, a, a)`` semantics (reference
    traffic_dataset.py:281): the four ops run in a RANDOM ORDER with one
    factor each — brightness/contrast/saturation are clamped blends with
    f ~ U(max(0, 1-a), 1+a), hue is an exact RGB<->HSV rotation with
    shift ~ U(-a, a). img float32 (H, W, 3) in [0, 1]."""
    def blend(a, b, f):
        return np.clip(f * a + (1.0 - f) * b, 0.0, 1.0).astype(np.float32)

    order = rng.permutation(4)
    lo = max(0.0, 1.0 - amount)
    f_bright = rng.uniform(lo, 1.0 + amount)
    f_contrast = rng.uniform(lo, 1.0 + amount)
    f_sat = rng.uniform(lo, 1.0 + amount)
    f_hue = rng.uniform(-amount, amount)
    for op in order:
        if op == 0:
            img = blend(img, np.zeros((), np.float32), f_bright)
        elif op == 1:
            gray_mean = (img @ _GRAY_WEIGHTS).mean(dtype=np.float32)
            img = blend(img, gray_mean, f_contrast)
        elif op == 2:
            img = blend(img, (img @ _GRAY_WEIGHTS)[..., None], f_sat)
        else:
            img = _adjust_hue(img, f_hue)
    return img


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
        self.img_size = conf.img_size or IMG_SIZE
        # reference shifts up to 100 px at 1200x1600
        # (traffic_dataset.py:282); scale with any img_size override, or
        # take conf.max_shift verbatim (the reference's translate
        # FRACTION 100/IMG_SIZE yields 100 px at ANY resolution — set
        # max_shift=100 to match it exactly at a reduced img_size)
        if getattr(conf, "max_shift", None) is not None:
            self.max_shift = (conf.max_shift, conf.max_shift)
        else:
            self.max_shift = (max(1, round(100 * self.img_size[0] / 1200)),
                              max(1, round(100 * self.img_size[1] / 1600)))
        # input_norm='imagenet' moves normalization ON DEVICE
        # (models/ips_net.py) so patches ship as compact uint8 — 4x less
        # host->HBM traffic through the loader
        self.emit_uint8 = conf.input_norm == "imagenet"
        # per-__getitem__ generators (a shared np Generator is not
        # thread-safe under the threaded loader); the counter varies the
        # augmentation across epochs like the reference's global torch RNG
        self._draw = itertools.count()
        self._data = filter_sts(STS(conf.data_dir, train, conf.seed,
                                    allow_download=allow_download))

    def __len__(self):
        return len(self._data)

    def skip_draws(self, n: int) -> None:
        """Advance the augmentation stream by n item fetches (resume
        support: Loader.skip_epochs realigns a restored run with the
        unbroken run's per-item draw counter)."""
        import itertools
        self._draw = itertools.count(next(self._draw) + n)

    def _load_image(self, fpath: str) -> np.ndarray:
        from PIL import Image
        img = Image.open(fpath).convert("RGB")
        img = img.resize((self.img_size[1], self.img_size[0]), Image.BILINEAR)
        return np.asarray(img, np.float32) / 255.0

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        fpath, category = self._data[i]
        img = self._load_image(fpath)
        if self.train:
            rng = np.random.default_rng([self.seed, i, next(self._draw)])
            img = color_jitter(img, rng)
            img = random_translate(img, rng, max_dy=self.max_shift[0],
                                   max_dx=self.max_shift[1])
        if self.emit_uint8:
            img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        else:
            img = ((img - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)
        patches = patchify(img, self.patch_size, self.patch_stride)
        out = {"input": patches}
        for t in self.tasks:
            out[t.name] = np.int64(category)
        return out
