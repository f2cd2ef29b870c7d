"""CAMELYON16 subsystem: WSI methods, offline CLIs, feature dataset."""

import csv
import os

import numpy as np
import pytest

from ips_tpu.data.camelyon.dataset import (CamelyonFeatures, default_buckets,
                                           make_synth_features,
                                           pad_to_bucket)
from ips_tpu.data.camelyon.methods import (create_otsu_mask_by_threshold,
                                           create_tumor_mask,
                                           get_otsu_threshold, otsu_by_hist,
                                           remove_alpha_channel, rgb2gray,
                                           split_slide)
from ips_tpu.data.camelyon.slide import (Annotation, ArraySlide, Slide,
                                         SlideManager,
                                         parse_asap_annotations)


def _tissue_image(H=600, W=400, seed=0):
    """White background with a dark 'tissue' blob (HE-ish purple)."""
    rng = np.random.default_rng(seed)
    img = np.full((H, W, 3), 245, np.uint8)
    y0, y1 = H // 6, 2 * H // 3
    x0, x1 = W // 8, 3 * W // 4
    img[y0:y1, x0:x1] = rng.integers(
        120, 200, (y1 - y0, x1 - x0, 3), dtype=np.int64).astype(np.uint8)
    img[y0:y1, x0:x1, 1] //= 2      # low green => HE-gray lights up
    return img


class TestMethods:
    def test_rgb2gray_he(self):
        # pure formula check: r + b - (r+g+b)/1.5, clipped
        rgb = np.array([[[30, 60, 90]]], np.float64)
        expect = 30 + 90 - (30 + 60 + 90) / 1.5
        assert rgb2gray(rgb)[0, 0] == pytest.approx(expect)
        assert rgb2gray(np.full((1, 1, 3), 255.0))[0, 0] <= 255

    def test_remove_alpha(self):
        rgba = np.zeros((4, 4, 4), np.uint8)
        assert remove_alpha_channel(rgba).shape == (4, 4, 3)
        rgb = np.zeros((4, 4, 3), np.uint8)
        assert remove_alpha_channel(rgb) is rgb

    def test_otsu_by_hist_bimodal(self):
        # two clear modes at 10 and 200 -> threshold between them
        values = np.array([10.0, 11.0, 200.0, 201.0])
        hist = np.array([500, 500, 500, 500])
        t = otsu_by_hist(hist, values)
        assert 11.0 <= t < 200.0

    def test_chunked_otsu_on_slide(self):
        slide = ArraySlide(_tissue_image())
        t = get_otsu_threshold(slide, level=0, step_size=128)
        gray = rgb2gray(_tissue_image().astype(np.float64))
        # threshold separates tissue (high HE-gray) from background (low)
        assert gray[200, 100] > t >= gray[10, 10]

    def test_otsu_mask_components(self):
        img = np.zeros((20, 20))
        img[2:6, 2:6] = 100          # strong component
        img[12:16, 12:16] = 30       # weak-only component (> 0.25*t only)
        mask = create_otsu_mask_by_threshold(img, 50.0)
        assert mask[3, 3] == 1
        assert mask[13, 13] == 0     # dropped: no strong pixel

    def test_tumor_mask_polygon(self):
        slide = Slide("s", "unused")
        slide._reader = ArraySlide(_tissue_image())
        slide.annotation_filename = "x"  # mark annotated
        slide._annotations = [Annotation("a", "t", "g", "c",
                                         [(50, 100), (250, 100), (250, 300),
                                          (50, 300)])]
        mask = create_tumor_mask(slide, 0)
        assert mask[200, 150] == 1 and mask[50, 50] == 0
        # bounded section
        sec = create_tumor_mask(slide, 0, ((50, 100), (100, 100)))
        assert sec[10, 10] == 1

    def test_split_slide_yields_tissue_tiles(self):
        slide = Slide("s", "unused")
        slide._reader = ArraySlide(_tissue_image())
        slide._annotations = []
        t = get_otsu_threshold(slide, step_size=200)
        tiles = list(split_slide(slide, 0, t, 0.05, 100, 0))
        assert len(tiles) >= 1
        for tile, ((x, y), (w0, h0)) in tiles:
            assert tile.shape == (100, 100, 3)
            assert w0 == h0 == 100
        # all-background slide yields nothing
        bg = Slide("b", "unused")
        bg._reader = ArraySlide(np.full((300, 300, 3), 245, np.uint8))
        bg._annotations = []
        assert list(split_slide(bg, 0, t, 0.05, 100, 0)) == []

    def test_split_slide_validation(self):
        slide = Slide("s", "unused")
        slide._reader = ArraySlide(_tissue_image())
        with pytest.raises(ValueError):
            list(split_slide(slide, 0, 10.0, 0.01, 64, 64))
        with pytest.raises(ValueError):
            list(split_slide(slide, 0, -1.0, 0.01, 64, 0))


ASAP_XML = """<?xml version="1.0"?>
<ASAP_Annotations>
  <Annotations>
    <Annotation Name="_0" Type="Polygon" PartOfGroup="Tumor" Color="#F4FA58">
      <Coordinates>
        <Coordinate Order="0" X="100.5" Y="200.5"/>
        <Coordinate Order="1" X="300.0" Y="200.5"/>
        <Coordinate Order="2" X="300.0" Y="400.0"/>
      </Coordinates>
    </Annotation>
  </Annotations>
</ASAP_Annotations>
"""


class TestSlideModel:
    def test_parse_asap(self, tmp_path):
        p = tmp_path / "a.xml"
        p.write_text(ASAP_XML)
        anns = parse_asap_annotations(str(p))
        assert len(anns) == 1
        assert anns[0].polygon == [(100.5, 200.5), (300.0, 200.5),
                                   (300.0, 400.0)]
        assert anns[0].part_of_group == "Tumor"

    def test_array_slide_levels(self):
        s = ArraySlide(_tissue_image(400, 400), n_levels=3)
        assert s.level_dimensions[0] == (400, 400)
        assert s.level_dimensions[1] == (200, 200)
        assert s.level_downsamples[2] == pytest.approx(4.0)
        r = s.read_region((100, 100), 0, (64, 64))
        assert r.shape == (64, 64, 3)

    def test_read_tiles_matches_loop(self):
        """The vectorized grid gather must equal per-tile read_region on
        every path: aligned grid (fast path), misaligned coords
        (fallback), non-contiguous downsampled level (fallback), partly
        out-of-bounds tiles (fallback, zero-padded)."""
        s = ArraySlide(_tissue_image(416, 384), n_levels=3)

        def loop(xys, lvl, wh):
            w, h = wh
            return np.stack([s.read_region((int(x), int(y)), lvl, wh)[
                :h, :w, :3] for x, y in xys])

        # aligned 32px grid at level 0 (contiguous -> vectorized path)
        xys = [(0, 0), (32, 64), (352, 320), (64, 32), (320, 352)]
        got = s.read_tiles(xys, 0, (32, 32))
        np.testing.assert_array_equal(got, loop(xys, 0, (32, 32)))
        assert got.dtype == np.uint8 and got.shape == (5, 32, 32, 3)
        # preallocated out
        out = np.zeros((5, 32, 32, 3), np.uint8)
        assert s.read_tiles(xys, 0, (32, 32), out=out) is out
        np.testing.assert_array_equal(out, got)
        # misaligned coords -> fallback, same values
        xys_mis = [(7, 13), (100, 50)]
        np.testing.assert_array_equal(
            s.read_tiles(xys_mis, 0, (32, 32)), loop(xys_mis, 0, (32, 32)))
        # level 1 is a [::2, ::2] view (non-contiguous) -> fallback
        np.testing.assert_array_equal(
            s.read_tiles([(0, 0), (64, 64)], 1, (32, 32)),
            loop([(0, 0), (64, 64)], 1, (32, 32)))
        # out-of-bounds tail -> fallback zero-pads like read_region
        xys_oob = [(384, 352), (400, 368)]
        np.testing.assert_array_equal(
            s.read_tiles(xys_oob, 0, (32, 32)), loop(xys_oob, 0, (32, 32)))
        # empty request
        assert s.read_tiles([], 0, (32, 32)).shape == (0, 32, 32, 3)

    @pytest.fixture()
    def cam_dir(self, tmp_path):
        from PIL import Image
        d = tmp_path / "cam16"
        for sub in ["training/normal", "training/tumor",
                    "training/lesion_annotations", "testing/images"]:
            (d / sub).mkdir(parents=True)
        img = Image.fromarray(_tissue_image(300, 300))
        img.save(d / "training/normal/normal_001.png")
        img.save(d / "training/tumor/tumor_001.png")
        (d / "training/lesion_annotations/tumor_001.xml").write_text(ASAP_XML)
        img.save(d / "testing/images/test_001.png")
        with open(d / "otsu.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "level", "threshold"])
            w.writerow(["normal_001", 0, 12.5])
        return str(d)

    def test_slide_manager(self, cam_dir):
        man = SlideManager(data_dir=cam_dir, otsu_fname="otsu.csv")
        assert man.slide_names == ("normal_001", "tumor_001", "test_001")
        assert not man.get_slide("normal_001").has_tumor
        assert man.get_slide("tumor_001").has_tumor
        assert len(man.get_slide("tumor_001").annotations) == 1
        assert man.get_slide("normal_001").get_otsu_threshold(0) == 12.5
        assert man.get_slide_names_subset(train=True) == ("normal_001",
                                                          "tumor_001")
        assert man.get_slide_names_subset(train=False) == ("test_001",)

    def test_foreground_skips_blank_slide(self, cam_dir):
        """A slide yielding zero foreground tiles must be skipped, not
        emitted as a corrupt bounds row (name '', end_id < start_id)."""
        import numpy as np
        import pandas as pd
        from PIL import Image

        from ips_tpu.data.camelyon.foreground import compute_foreground

        blank = Image.fromarray(np.full((300, 300, 3), 255, np.uint8))
        blank.save(os.path.join(cam_dir, "training/normal/normal_002.png"))
        with open(os.path.join(cam_dir, "otsu3.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["name", "level", "threshold"])
            for n in ["normal_001", "normal_002", "tumor_001", "test_001"]:
                w.writerow([n, 0, 12.5])

        coords_p, bounds_p = compute_foreground(
            cam_dir, "otsu3.csv", os.path.join(cam_dir, "fg2"), train=True,
            tile_size=100, fg_perc_thresh=0.05, n_worker=1)
        bounds = pd.read_pickle(bounds_p)
        assert set(bounds["name"]) == {"normal_001", "tumor_001"}
        assert (bounds["end_id"] >= bounds["start_id"]).all()

    @pytest.mark.slow  # full otsu->foreground->extract_feat pipeline
    def test_offline_pipeline_end_to_end(self, cam_dir):
        """otsu CLI -> foreground CLI -> extract_feat with a toy encoder."""
        from ips_tpu.data.camelyon.extract_feat import extract_features
        from ips_tpu.data.camelyon.foreground import compute_foreground
        from ips_tpu.data.camelyon.otsu import compute_thresholds

        otsu_path = compute_thresholds(cam_dir, "otsu2.csv", n_worker=1)
        assert os.path.exists(otsu_path)
        with open(otsu_path) as f:
            rows = list(csv.DictReader(f))
        assert {r["name"] for r in rows} == {"normal_001", "tumor_001",
                                             "test_001"}

        out = os.path.join(cam_dir, "fg")
        coords_p, bounds_p = compute_foreground(
            cam_dir, "otsu2.csv", out, train=True, tile_size=100,
            fg_perc_thresh=0.05, n_worker=1)
        import pandas as pd
        coords = pd.read_pickle(coords_p)
        bounds = pd.read_pickle(bounds_p)
        assert len(coords) > 0 and len(bounds) == 2
        assert list(coords.columns) == ["name", "x", "y", "pos_id"]

        feat_path = os.path.join(cam_dir, "feat.h5")

        def toy_encoder(batch):   # (B, 224, 224, 3) -> (B, 8)
            return batch.mean(axis=(1, 2)).repeat(3, axis=-1)[:, :8]

        extract_features(cam_dir, "otsu2.csv", bounds_p, coords_p, feat_path,
                         tile_size=100, batch_size=4, encoder=toy_encoder)
        import h5py
        with h5py.File(feat_path) as f:
            names = list(f.keys())
            assert set(names) == {"normal_001", "tumor_001"}
            assert f["tumor_001"].attrs["label"] == 1
            assert f["normal_001"].attrs["label"] == 0
            assert f["normal_001"]["img"].shape[1] == 8
            n = f["normal_001"]["img"].shape[0]
            assert f["normal_001"]["pos"].shape == (n,)

    @pytest.mark.slow
    def test_pipelined_encoder_matches_sync(self, cam_dir):
        """The async dispatch/fetch pipeline (depth-1 overlap + writer
        thread) must write a byte-identical HDF5 to the eager callable
        path — batch order, tail padding, and slide grouping included."""
        import h5py
        import pandas as pd

        from ips_tpu.data.camelyon.extract_feat import extract_features
        from ips_tpu.data.camelyon.foreground import compute_foreground
        from ips_tpu.data.camelyon.otsu import compute_thresholds

        compute_thresholds(cam_dir, "otsu4.csv", n_worker=1)
        coords_p, bounds_p = compute_foreground(
            cam_dir, "otsu4.csv", os.path.join(cam_dir, "fg4"), train=True,
            tile_size=100, fg_perc_thresh=0.05, n_worker=1)

        def toy(batch):   # (B, h, w, 3) float -> (B, 8)
            return batch.mean(axis=(1, 2)).repeat(3, axis=-1)[:, :8]

        class AsyncToy:
            """Pipeline-API encoder whose fetch is deliberately deferred,
            so misordered dispatch/fetch pairing would corrupt output."""

            def dispatch(self, tiles_u8):
                return np.array(tiles_u8)  # snapshot, like a device put

            def fetch(self, handle):
                return toy(handle.astype(np.float32) / 255.0)

        p_sync = os.path.join(cam_dir, "feat_sync.h5")
        p_pipe = os.path.join(cam_dir, "feat_pipe.h5")
        extract_features(cam_dir, "otsu4.csv", bounds_p, coords_p, p_sync,
                         tile_size=100, batch_size=3, encoder=toy)
        extract_features(cam_dir, "otsu4.csv", bounds_p, coords_p, p_pipe,
                         tile_size=100, batch_size=3, encoder=AsyncToy())
        with h5py.File(p_sync) as a, h5py.File(p_pipe) as b:
            assert list(a.keys()) == list(b.keys())
            for name in a:
                np.testing.assert_array_equal(a[name]["img"][:],
                                              b[name]["img"][:])
                np.testing.assert_array_equal(a[name]["pos"][:],
                                              b[name]["pos"][:])
                assert a[name].attrs["label"] == b[name].attrs["label"]

    def test_writer_thread_error_propagates(self, cam_dir, tmp_path):
        """A writer-side failure must raise on the main thread, not
        deadlock the bounded queue."""
        from ips_tpu.data.camelyon.extract_feat import extract_features
        from ips_tpu.data.camelyon.foreground import compute_foreground
        from ips_tpu.data.camelyon.otsu import compute_thresholds

        compute_thresholds(cam_dir, "otsu5.csv", n_worker=1)
        coords_p, bounds_p = compute_foreground(
            cam_dir, "otsu5.csv", os.path.join(cam_dir, "fg5"), train=True,
            tile_size=100, fg_perc_thresh=0.05, n_worker=1)

        def bad_encoder(batch):  # wrong rank -> create_dataset fails
            return np.zeros((), np.float32)

        with pytest.raises(Exception):
            extract_features(cam_dir, "otsu5.csv", bounds_p, coords_p,
                             str(tmp_path / "bad.h5"), tile_size=100,
                             batch_size=4, encoder=bad_encoder)

    def test_uint8_injit_normalize_matches_fp32_feed(self):
        """PipelinedJaxEncoder's uint8 feed (in-jit /255) must be bit-
        identical to the legacy host-normalized fp32 feed."""
        from ips_tpu.data.camelyon.extract_feat import PipelinedJaxEncoder

        rng = np.random.default_rng(0)
        tiles = rng.integers(0, 256, (5, 224, 224, 3), dtype=np.uint8)
        enc = PipelinedJaxEncoder(enc_type="resnet18", batch_size=8)
        pipe = enc.fetch(enc.dispatch(tiles))
        enc.sync_fp32 = True
        legacy = enc.fetch(enc.dispatch(tiles))
        np.testing.assert_array_equal(pipe, legacy)
        assert pipe.shape == (5, 512)


class TestFeatureDataset:
    def test_buckets(self):
        assert default_buckets(100, 10, 20) == [10, 30, 50, 90, 170]
        x = np.ones((37, 4), np.float32)
        padded, mask = pad_to_bucket(x, [10, 50, 100])
        assert padded.shape == (50, 4)
        assert mask.sum() == 37 and not mask[37:].any()
        assert (padded[37:] == 0).all()
        with pytest.raises(ValueError):
            pad_to_bucket(np.ones((200, 4)), [100])

    def test_dataset_loads_synth(self, tmp_path, feat_conf):
        path = str(tmp_path / "synth.h5")
        make_synth_features(path, n_slides=6, feat_dim=feat_conf.n_chan_in,
                            n_range=(20, 60))
        conf = feat_conf.replace(data_dir=str(tmp_path),
                                 train_fname="synth.h5",
                                 test_fname="synth.h5", M=8, I=8)
        ds = CamelyonFeatures(conf, train=True)
        assert len(ds) == 6
        item = ds[0]
        assert item["input"].shape[0] in ds.buckets
        assert item["mask"].dtype == bool
        assert item["metastases"] in (0, 1)
        # thread-safety: loader with workers
        from ips_tpu.data.loader import DataLoader
        batches = list(DataLoader(ds, batch_size=1, num_workers=2))
        assert len(batches) == 6


    @pytest.mark.parametrize("spd", [1, 2])
    @pytest.mark.slow  # multi-epoch bucket-batched train
    def test_bucket_batched_training(self, tmp_path, feat_conf, spd):
        """B_seq > 1 on variable-N features via bucket-batched loading —
        the fused select+train path (and steps_per_dispatch) now applies
        to the camelyon workload, which the reference locks to B_seq=1
        (config/camelyon_config.yml:4-5). Every slide must be trained on
        and logged exactly once per epoch."""
        from ips_tpu.data.loader import DataLoader
        from ips_tpu.main import build_loaders
        from ips_tpu.train.loop import evaluate, train_one_epoch
        from ips_tpu.train.metrics import MetricsLogger
        from ips_tpu.train.steps import IPSTrainer

        path = str(tmp_path / "synth.h5")
        make_synth_features(path, n_slides=10, feat_dim=feat_conf.n_chan_in,
                            n_range=(10, 70))        # spans >= 2 buckets
        conf = feat_conf.replace(data_dir=str(tmp_path),
                                 train_fname="synth.h5",
                                 test_fname="synth.h5", M=8, I=8,
                                 B=4, B_seq=4, mask_padding=True,
                                 steps_per_dispatch=spd)
        ds = CamelyonFeatures(conf, train=True)
        assert len({ds.bucket_of(i) for i in range(len(ds))}) >= 2
        loader, test_loader = build_loaders(conf, ds,
                                            CamelyonFeatures(conf, False))
        assert loader.bucket_fn is not None
        trainer = IPSTrainer(conf)
        log = MetricsLogger(conf.task_list)
        train_one_epoch(trainer, loader, 0, log, conf)
        assert len(log.y_trues["metastases"]) == 10
        log.compute_metric()
        assert np.isfinite(log.losses_epoch["metastases"][0])
        evaluate(trainer, test_loader, log, conf)
        assert len(log.y_trues["metastases"]) == 10
        log.compute_metric()
        assert 0.0 <= log.metrics["metastases"][-1] <= 1.0


    @pytest.mark.slow
    def test_bucket_batched_training_on_mesh(self, tmp_path, feat_conf):
        """Bucket-batched B_seq > 1 under the data-parallel mesh: per-
        bucket shapes each compile against the sharded jits, params stay
        replicated."""
        import jax

        from ips_tpu.main import build_loaders, build_trainer
        from ips_tpu.train.loop import train_one_epoch
        from ips_tpu.train.metrics import MetricsLogger

        path = str(tmp_path / "synth.h5")
        make_synth_features(path, n_slides=10, feat_dim=feat_conf.n_chan_in,
                            n_range=(10, 70))
        conf = feat_conf.replace(data_dir=str(tmp_path),
                                 train_fname="synth.h5",
                                 test_fname="synth.h5", M=8, I=8,
                                 B=4, B_seq=4, mask_padding=True,
                                 mesh_data=4)
        ds = CamelyonFeatures(conf, train=True)
        loader, _ = build_loaders(conf, ds, CamelyonFeatures(conf, False))
        trainer = build_trainer(conf)
        from ips_tpu.parallel.ips_sharded import ShardedIPSTrainer
        assert isinstance(trainer, ShardedIPSTrainer)
        log = MetricsLogger(conf.task_list)
        train_one_epoch(trainer, loader, 0, log, conf)
        assert len(log.y_trues["metastases"]) == 10
        for leaf in jax.tree_util.tree_leaves(trainer.state.params):
            assert leaf.sharding.is_fully_replicated


class TestSynthCorpus:
    def test_generator_layout_and_labels(self, tmp_path):
        """The synthetic corpus must walk through the UNMODIFIED
        SlideManager: normal/tumor/test dirs, ASAP polygons give tumor
        labels, odd test slides carry lesions."""
        from ips_tpu.data.camelyon.synth import generate_synth_camelyon
        d = str(tmp_path / "cam")
        generate_synth_camelyon(d, n_normal=2, n_tumor=2, n_test=4,
                                height=256, width=256, seed=0)
        man = SlideManager(data_dir=d, otsu_fname="missing.csv")
        assert len(man.get_slide_names_subset(train=True)) == 4
        assert len(man.get_slide_names_subset(train=False)) == 4
        assert not man.get_slide("normal_000").has_tumor
        tumor = man.get_slide("tumor_000")
        assert tumor.has_tumor and len(tumor.annotations) == 1
        assert not man.get_slide("test_000").has_tumor
        assert man.get_slide("test_001").has_tumor
        # lesions are inside the slide bounds
        poly = np.array(tumor.annotations[0].polygon)
        assert (poly >= 0).all() and (poly < 256).all()

    def test_contrast_jitter(self, tmp_path):
        """contrast_min draws per-slide contrast ~ U(min, max): labels
        and layout stay intact, and tumor slides genuinely differ in
        lesion strength (the weak-signal knob for sub-1.0 AUC
        plateaus — scripts/run_camelyon_largeN.sh genweak)."""
        from PIL import Image
        from ips_tpu.data.camelyon.synth import generate_synth_camelyon
        d = str(tmp_path / "cam_weak")
        generate_synth_camelyon(d, n_normal=1, n_tumor=6, n_test=2,
                                height=256, width=256, seed=0,
                                contrast=0.35, contrast_min=0.0)
        man = SlideManager(data_dir=d, otsu_fname="missing.csv")
        strengths = []
        for i in range(6):
            s = man.get_slide(f"tumor_{i:03d}")
            assert s.has_tumor and len(s.annotations) == 1
            img = np.asarray(Image.open(
                f"{d}/training/tumor/tumor_{i:03d}.png"), dtype=np.float32)
            poly = np.array(s.annotations[0].polygon)
            cx, cy = poly[:, 0].mean(), poly[:, 1].mean()
            r = int(np.linalg.norm(poly[0] - [cx, cy]) * 0.5)
            y0, y1 = int(cy) - r, int(cy) + r
            x0, x1 = int(cx) - r, int(cx) + r
            inside = img[max(y0, 0):y1, max(x0, 0):x1].mean()
            strengths.append(inside)
        # with fixed contrast the in-lesion means cluster tightly; the
        # jitter must spread them (U(0, .35) spans faint to strong)
        assert np.ptp(strengths) > 5.0, strengths


# Tier: streaming uint8 end-to-end trains -- full pass only.
@pytest.mark.slow
class TestEndToEndImageMode:
    """CamelyonPatches: raw uint8 tiles through selection + training."""

    @pytest.fixture()
    def e2e_dir(self, tmp_path):
        from PIL import Image
        from ips_tpu.data.camelyon.foreground import compute_foreground
        from ips_tpu.data.camelyon.otsu import compute_thresholds
        d = tmp_path / "cam16"
        for sub in ["training/normal", "training/tumor",
                    "training/lesion_annotations", "testing/images"]:
            (d / sub).mkdir(parents=True)
        img = Image.fromarray(_tissue_image(300, 300))
        img.save(d / "training/normal/normal_001.png")
        img.save(d / "training/tumor/tumor_001.png")
        (d / "training/lesion_annotations/tumor_001.xml").write_text(ASAP_XML)
        img.save(d / "testing/images/test_001.png")
        compute_thresholds(str(d), "otsu.csv", n_worker=1)
        compute_foreground(str(d), "otsu.csv", str(d / "fg"), train=True,
                           tile_size=64, fg_perc_thresh=0.05, n_worker=1)
        compute_foreground(str(d), "otsu.csv", str(d / "fg"), train=False,
                           tile_size=64, fg_perc_thresh=0.05, n_worker=1)
        return str(d)

    def _conf(self, d):
        from ips_tpu.config import config_from_dict
        return config_from_dict(dict(
            n_epoch=1, B=2, B_seq=1, n_epoch_warmup=1, lr=1e-3, wd=0.1,
            n_class=1, data_dir=d, is_image=True, enc_type="resnet18",
            n_chan_in=3, n_res_blocks=2, shuffle=True, n_token=1,
            N=0, M=4, I=4, patch_size=[64, 64], patch_stride=[64, 64],
            use_pos=False, H=4, D=128, D_k=16, D_v=16, D_inner=128,
            compute_dtype="float32", eager=False, donate_buffers=False,
            tasks={"task0": {"id": 0, "name": "metastases",
                             "act_fn": "sigmoid", "metric": "auc"}}))

    def test_dataset_yields_uint8_tiles(self, e2e_dir):
        from ips_tpu.data.camelyon.patches import CamelyonPatches
        ds = CamelyonPatches(self._conf(e2e_dir), train=True)
        assert len(ds) == 2
        item = ds[0]
        assert item["input"].dtype == np.uint8
        assert item["input"].shape[1:] == (64, 64, 3)
        assert item["input"].shape[0] in ds.buckets
        assert item["mask"].sum() > 0
        assert item["metastases"] in (0, 1)

    def test_train_epoch_streaming_uint8(self, e2e_dir):
        import jax
        from ips_tpu.data.camelyon.patches import CamelyonPatches
        from ips_tpu.data.loader import DataLoader
        from ips_tpu.train.loop import train_one_epoch
        from ips_tpu.train.metrics import MetricsLogger
        from ips_tpu.train.steps import IPSTrainer
        conf = self._conf(e2e_dir)
        ds = CamelyonPatches(conf, train=True)
        loader = DataLoader(ds, batch_size=1, shuffle=False)
        trainer = IPSTrainer(conf, rng=jax.random.PRNGKey(0))
        log = MetricsLogger(conf.task_list)
        train_one_epoch(trainer, loader, 0, log, conf)
        assert len(log.losses_it["metastases"]) == 1   # one optimizer step
        assert np.isfinite(log.losses_it["metastases"][0])
