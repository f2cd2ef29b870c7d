"""Traffic-signs dataset: annotation parsing, filtering, augmentations."""

import numpy as np
import pytest

from ips_tpu.config import config_from_dict
from ips_tpu.data.traffic import (CLASSES, Sign, STS, TrafficSigns,
                                  color_jitter, filter_sts, parse_annotations,
                                  random_translate)

ANNOTATIONS = "\n".join([
    "img1.jpg:VISIBLE, 100.1, 200.2, 50.5, 150.x, PROHIBITORY, 70_SIGN",
    "img2.jpg:",
    "img3.jpg:MISC_SIGNS;OCCLUDED, 90., 180., 40., 140., PROHIBITORY, 50_SIGN",
    "img4.jpg:BLURRED, 80., 170., 30., 130., PROHIBITORY, 80_SIGN;"
    "VISIBLE, 85., 175., 35., 135., PROHIBITORY, 50_SIGN",
    "img5.jpg:VISIBLE, 60., 160., 20., 120., INFORMATION, PED_CROSSING",
])


@pytest.fixture()
def annot_file(tmp_path):
    p = tmp_path / "annotations.txt"
    p.write_text(ANNOTATIONS + "\n")
    return str(p)


class TestParsing:
    def test_parse(self, annot_file):
        recs = parse_annotations(annot_file)
        assert len(recs) == 5
        name, signs = recs[0]
        assert name == "img1.jpg" and len(signs) == 1
        s = signs[0]
        assert s.visibility == "VISIBLE" and s.name == "70_SIGN"
        # trailing-junk float parsing ('150.' etc.)
        assert s.bbox == (100.1, 200.2, 50.5, 150.0)
        # MISC_SIGNS dropped
        assert len(recs[2][1]) == 1
        # empty annotation line -> no signs
        assert recs[1][1] == []

    def test_sign_ordering(self):
        visible_small = Sign("VISIBLE", (10, 10, 0, 0), "t", "50_SIGN")
        visible_big = Sign("VISIBLE", (100, 100, 0, 0), "t", "50_SIGN")
        blurred_huge = Sign("BLURRED", (500, 500, 0, 0), "t", "50_SIGN")
        ranked = sorted([blurred_huge, visible_small, visible_big],
                        key=Sign.sort_key)
        assert ranked[0] is visible_big       # visible first, larger first
        assert ranked[-1] is blurred_huge


class TestFilter:
    def test_filter_semantics(self):
        data = [
            ("a", []),                                             # EMPTY
            ("b", [Sign("VISIBLE", (85, 175, 35, 135), "t", "50_SIGN")]),
            ("c", [Sign("OCCLUDED", (90, 180, 40, 140), "t", "50_SIGN")]),
            ("d", [Sign("VISIBLE", (60, 160, 20, 120), "t", "PED")]),  # drop
            ("e", [Sign("BLURRED", (80, 170, 30, 130), "t", "80_SIGN"),
                   Sign("VISIBLE", (85, 175, 35, 135), "t", "50_SIGN")]),
        ]
        out = filter_sts(data)
        assert ("a", 0) in out
        assert ("b", CLASSES.index("50_SIGN")) in out
        assert all(n != "c" for n, _ in out)     # occluded top sign -> drop
        assert all(n != "d" for n, _ in out)     # non-limit signs -> drop
        # most visible limit sign wins
        assert ("e", CLASSES.index("50_SIGN")) in out


class TestSynthCorpus:
    def test_generate_load_and_filter(self, tmp_path):
        """The synthetic STS corpus must load through the UNMODIFIED
        TrafficSigns pipeline: md5 gate bypassed by the SYNTHETIC marker,
        all 4 classes present, OCCLUDED sign images filtered out."""
        from ips_tpu.config import config_from_dict
        from ips_tpu.data.traffic import TrafficSigns
        from ips_tpu.data.traffic_synth import generate_synth_sts
        d = str(tmp_path / "sts")
        generate_synth_sts(d, n_per_set=24, height=240, width=320, seed=0,
                           occluded_frac=0.5)
        conf = config_from_dict(dict(
            n_epoch=1, B=4, B_seq=4, lr=1e-3, wd=0.1, n_class=4,
            data_dir=d, n_worker=0, is_image=True, enc_type="resnet18",
            n_chan_in=3, n_res_blocks=2, shuffle=False, n_token=1,
            N=192, M=4, I=4, patch_size=[100, 100],
            patch_stride=[100, 100], use_pos=False, H=2, D=128, D_k=8,
            D_v=8, D_inner=64, donate_buffers=False,
            tasks={"task0": {"id": 0, "name": "sign", "act_fn": "softmax",
                             "metric": "accuracy"}}))
        ds = TrafficSigns(conf, train=True)
        labels = [int(ds._data[i][1]) for i in range(len(ds))]
        assert set(labels) == {0, 1, 2, 3}
        # 24 per set, 18 with signs, ~half OCCLUDED and dropped
        assert 6 + 4 <= len(ds) < 24
        item = ds[0]
        assert item["input"].shape == (192, 100, 100, 3)

    def test_generate_contrast_knob(self, tmp_path):
        """Weak-signal knob: contrast=0 blends the sign entirely into the
        background (image identical to pre-paint), contrast=1 paints it
        opaque; labels/annotations are unchanged either way."""
        import numpy as np
        from PIL import Image
        from ips_tpu.data.traffic_synth import generate_synth_sts
        d0 = str(tmp_path / "c0")
        d1 = str(tmp_path / "c1")
        for d, c in ((d0, 1e-9), (d1, 1.0)):
            generate_synth_sts(d, n_per_set=8, height=120, width=160,
                               seed=0, occluded_frac=0.0, contrast=c)
        # same seed -> identical backgrounds + annotation lines; the
        # contrast=1 sign images must differ from the ~invisible-sign ones
        a0 = open(d0 + "/Set1/annotations.txt").read()
        a1 = open(d1 + "/Set1/annotations.txt").read()
        assert a0 == a1 and "50_SIGN" in a0
        diffs = []
        for i in range(8):
            f = f"set1_img{i:04d}.jpg"
            i0 = np.asarray(Image.open(f"{d0}/Set1/{f}"), np.float32)
            i1 = np.asarray(Image.open(f"{d1}/Set1/{f}"), np.float32)
            diffs.append(np.abs(i0 - i1).mean())
        # class 0 (EMPTY, i % 4 == 0) images are byte-identical; sign
        # images differ visibly at full contrast (sign covers ~1% of the
        # frame, so the whole-image mean |diff| is small but well above
        # the zero of the EMPTY rows)
        assert diffs[0] < 0.01 and diffs[4] < 0.01
        assert max(diffs[1], diffs[2], diffs[3]) > 0.4

    def test_marker_requires_annotations(self, tmp_path):
        from ips_tpu.data.traffic import ensure_dataset_exists
        d = tmp_path / "broken"
        d.mkdir()
        (d / "SYNTHETIC").write_text("x")
        with pytest.raises(FileNotFoundError, match="annotations missing"):
            ensure_dataset_exists(str(d), allow_download=False)


class TestAugment:
    def test_color_jitter_bounds(self, np_rng):
        img = np_rng.random((16, 16, 3)).astype(np.float32)
        out = color_jitter(img, np_rng)
        assert out.shape == img.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert not np.allclose(out, img)

    def test_hsv_roundtrip_matches_colorsys(self, np_rng):
        """The HSV conversions must agree with the stdlib's colorsys
        (torchvision's adjust_hue uses the same classic formulas)."""
        import colorsys

        from ips_tpu.data.traffic import _hsv_to_rgb, _rgb_to_hsv
        pix = np_rng.random((64, 1, 3)).astype(np.float32)
        h, s, v = _rgb_to_hsv(pix)
        for k in range(64):
            eh, es, ev = colorsys.rgb_to_hsv(*pix[k, 0])
            np.testing.assert_allclose([h[k, 0], s[k, 0], v[k, 0]],
                                       [eh, es, ev], atol=1e-5)
        back = _hsv_to_rgb(h, s, v)
        np.testing.assert_allclose(back, pix, atol=1e-5)

    def test_adjust_hue_exact(self, np_rng):
        """Hue shift must match a colorsys-based oracle (the reference
        uses torchvision's exact HSV rotation, traffic_dataset.py:281),
        and a zero shift must be the identity."""
        import colorsys

        from ips_tpu.data.traffic import _adjust_hue
        pix = np_rng.random((32, 1, 3)).astype(np.float32)
        np.testing.assert_allclose(_adjust_hue(pix, 0.0), pix, atol=1e-5)
        shifted = _adjust_hue(pix, 0.23)
        for k in range(32):
            h, s, v = colorsys.rgb_to_hsv(*pix[k, 0])
            exp = colorsys.hsv_to_rgb((h + 0.23) % 1.0, s, v)
            np.testing.assert_allclose(shifted[k, 0], exp, atol=1e-5)

    def test_color_jitter_randomizes_order(self):
        """torchvision applies the 4 ops in a random permutation per call;
        with a fixed order, hue-then-brightness and brightness-then-hue
        would be indistinguishable across rng draws."""
        img = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
        outs = {color_jitter(img, np.random.default_rng(s)).tobytes()
                for s in range(12)}
        assert len(outs) >= 10  # different orders/factors -> different outputs

    def test_random_translate(self):
        img = np.zeros((10, 10, 1), np.float32)
        img[5, 5] = 1.0
        rng = np.random.default_rng(3)
        out = random_translate(img, rng, max_dx=2, max_dy=2)
        assert out.sum() == 1.0                  # point moved, not lost
        y, x, _ = np.argwhere(out == 1.0)[0]
        assert abs(y - 5) <= 2 and abs(x - 5) <= 2

    def test_translate_clips_at_border(self):
        img = np.ones((6, 6, 1), np.float32)

        class FixedRng:
            def integers(self, lo, hi):
                return 3
        out = random_translate(img, FixedRng(), 3, 3)
        assert out[:3].sum() == 0 and out[3:, 3:].sum() == 9


class TestDataset:
    def test_missing_data_raises_clearly(self, tmp_path):
        conf = config_from_dict(dict(
            data_dir=str(tmp_path / "none"), patch_size=[100, 100],
            patch_stride=[100, 100], N=192, M=10, I=32, n_class=4,
            n_token=1,
            tasks={"task0": {"id": 0, "name": "sign", "act_fn": "softmax",
                             "metric": "accuracy"}}))
        with pytest.raises(FileNotFoundError, match="STS dataset"):
            TrafficSigns(conf, train=True, allow_download=False)

    def test_end_to_end_with_local_images(self, tmp_path, annot_file, np_rng):
        # Build a fake Set1/Set2 with tiny images; dataset must resize,
        # normalize, and patchify them.
        import shutil
        from PIL import Image
        for s in ("Set1", "Set2"):
            d = tmp_path / s
            d.mkdir()
            shutil.copy(annot_file, d / "annotations.txt")
            for i in range(1, 6):
                arr = (np_rng.random((60, 80, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img{i}.jpg")
        conf = config_from_dict(dict(
            data_dir=str(tmp_path), patch_size=[100, 100],
            patch_stride=[100, 100], N=192, M=10, I=32, n_class=4,
            n_token=1, seed=0,
            tasks={"task0": {"id": 0, "name": "sign", "act_fn": "softmax",
                             "metric": "accuracy"}}))

        import ips_tpu.data.traffic as traffic_mod
        orig = traffic_mod.file_md5_ok
        traffic_mod.file_md5_ok = lambda *a: True  # bypass md5 for fixture
        try:
            ds = TrafficSigns(conf, train=True, allow_download=False)
            # img1 (70), img2 (EMPTY), img4 (50); img3 occluded, img5 no limit
            assert len(ds) == 3
            item = ds[0]
            assert item["input"].shape == (192, 100, 100, 3)  # 12*16 patches
            assert 0 <= item["sign"] < 4
            ds_eval = TrafficSigns(conf, train=False, allow_download=False)
            item2 = ds_eval[0]
            assert item2["input"].shape == (192, 100, 100, 3)
        finally:
            traffic_mod.file_md5_ok = orig


class TestImgSizeAndUint8Mode:
    """Round-2 knobs: `img_size` resize override and the on-device
    normalization path (`input_norm='imagenet'`) that ships uint8."""

    def _synth_conf(self, tmp_path, **over):
        from ips_tpu.data.traffic_synth import generate_synth_sts
        d = str(tmp_path / "sts")
        generate_synth_sts(d, n_per_set=8, height=120, width=160, seed=0)
        base = dict(
            n_epoch=1, B=2, B_seq=2, lr=1e-3, wd=0.1, n_class=4,
            data_dir=d, n_worker=0, is_image=True, enc_type="resnet18",
            n_chan_in=3, n_res_blocks=2, shuffle=False, n_token=1,
            N=48, M=4, I=4, patch_size=[50, 50], patch_stride=[50, 50],
            img_size=[300, 400], use_pos=False, H=2, D=128, D_k=8,
            D_v=8, D_inner=64, donate_buffers=False,
            tasks={"task0": {"id": 0, "name": "sign", "act_fn": "softmax",
                             "metric": "accuracy"}})
        base.update(over)
        return config_from_dict(base)

    def test_img_size_override_changes_patch_grid(self, tmp_path):
        conf = self._synth_conf(tmp_path)
        ds = TrafficSigns(conf, train=True)
        assert ds.img_size == (300, 400)
        # translate limit scales with the resize (reference: 100px@1200x1600)
        assert ds.max_shift == (25, 25)
        assert ds[0]["input"].shape == (48, 50, 50, 3)

    def test_max_shift_override(self, tmp_path):
        """max_shift=k pins the translate bound in px regardless of
        img_size — matches the reference's RandomAffine, whose translate
        FRACTION 100/IMG_SIZE yields 100 px at ANY resolution
        (traffic_dataset.py:282); the h2h harness relies on this."""
        conf = self._synth_conf(tmp_path, max_shift=100)
        ds = TrafficSigns(conf, train=True)
        assert ds.max_shift == (100, 100)
        conf0 = self._synth_conf(tmp_path, max_shift=0)
        ds0 = TrafficSigns(conf0, train=True)
        assert ds0.max_shift == (0, 0)
        # max_shift=0 disables translation: train item == eval item up to
        # color jitter, so just check determinism of the zero-shift path
        it = ds0[0]["input"]
        assert it.shape == (48, 50, 50, 3)

    def test_skip_draws_matches_unbroken_stream(self, tmp_path):
        """skip_draws(n) reproduces the unbroken augmentation stream: a
        dataset that skipped n draws returns the same augmented item the
        original returns on its (n+1)-th fetch (resume realignment)."""
        conf = self._synth_conf(tmp_path)
        a = TrafficSigns(conf, train=True)
        for i in (0, 1, 2):
            a[i]
        want = a[3]["input"]
        b = TrafficSigns(conf, train=True)
        b.skip_draws(3)
        np.testing.assert_array_equal(b[3]["input"], want)

    def test_uint8_mode_emits_uint8_and_matches_float_path(self, tmp_path):
        conf_u8 = self._synth_conf(tmp_path, input_norm="imagenet")
        conf_f32 = self._synth_conf(tmp_path)
        # eval split: no stochastic augmentation, so both paths see the
        # same resized image
        ds_u8 = TrafficSigns(conf_u8, train=False)
        ds_f32 = TrafficSigns(conf_f32, train=False)
        a, b = ds_u8[0]["input"], ds_f32[0]["input"]
        assert a.dtype == np.uint8 and b.dtype == np.float32
        from ips_tpu.data.traffic import IMAGENET_MEAN, IMAGENET_STD
        renorm = (a.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        # only uint8 rounding noise between the two paths
        np.testing.assert_allclose(renorm, b, atol=0.5 / 255 / 0.2 + 1e-6)

    def test_on_device_normalization_matches_host(self, tmp_path):
        """encode(uint8, input_norm='imagenet') == encode(host-normalized
        float) up to uint8 rounding: the device path must apply the exact
        ImageNet constants after the /255 scaling."""
        import jax
        from ips_tpu.train.steps import IPSTrainer
        conf_u8 = self._synth_conf(tmp_path, input_norm="imagenet")
        conf_f32 = self._synth_conf(tmp_path)
        ds_u8 = TrafficSigns(conf_u8, train=False)
        ds_f32 = TrafficSigns(conf_f32, train=False)
        x_u8 = ds_u8[0]["input"][None]          # (1, N, ph, pw, 3) uint8
        x_f32 = ds_f32[0]["input"][None]
        tr_u8 = IPSTrainer(conf_u8)
        tr_f32 = IPSTrainer(conf_f32)           # same seed -> same params
        from ips_tpu.models.ips_net import IPSModel
        def enc(tr, x):
            return tr.model.apply(
                {"params": tr.state.params,
                 "batch_stats": tr.state.batch_stats},
                x, train=False, method=IPSModel.encode)
        e_u8 = np.asarray(enc(tr_u8, x_u8))
        e_f32 = np.asarray(enc(tr_f32, x_f32))
        np.testing.assert_allclose(e_u8, e_f32, atol=5e-2, rtol=1e-2)

    def test_input_norm_requires_rgb_images(self):
        with pytest.raises(ValueError, match="RGB"):
            config_from_dict(dict(
                n_epoch=1, B=1, B_seq=1, lr=1e-3, wd=0.1, n_class=2,
                is_image=False, n_chan_in=64, n_token=1, N=8, M=2, I=2,
                input_norm="imagenet", H=2, D=32, D_k=8, D_v=8, D_inner=32,
                tasks={"task0": {"id": 0, "name": "t", "act_fn": "softmax",
                                 "metric": "accuracy"}}))
