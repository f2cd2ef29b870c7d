"""AOT serving export (ips_tpu/export.py): artifact == live predictor."""

import jax
import numpy as np

from ips_tpu.export import ExportedPredictor, export_predictor
from ips_tpu.infer import Predictor
from ips_tpu.train.steps import IPSTrainer


def _patches(conf, n=None):
    r = np.random.default_rng(2)
    shape = ((conf.B, n or conf.N, *conf.patch_size, conf.n_chan_in)
             if conf.is_image else (conf.B, n or conf.N, conf.n_chan_in))
    return r.normal(0, 1, shape).astype(np.float32)


def test_exported_matches_live_image_mode(tiny_conf, tmp_path):
    conf = tiny_conf
    trainer = IPSTrainer(conf)
    predictor = Predictor(conf, trainer=trainer)
    exported = export_predictor(predictor, batch_size=conf.B)

    path = tmp_path / "model.ipsx"
    path.write_bytes(exported.serialize())
    model = ExportedPredictor.load(str(path))
    assert (model.batch_size, model.n_patches) == (conf.B, conf.N)

    patches = _patches(conf)
    out = model.predict(patches)
    live = predictor.predict(patches)
    np.testing.assert_array_equal(out["selected_idx"], live["selected_idx"])
    for t in conf.task_list:
        np.testing.assert_allclose(out[t.name], live[t.name],
                                   rtol=0, atol=1e-5)


def test_exported_feature_mode_with_mask(feat_conf, tmp_path):
    conf = feat_conf.replace(B_seq=4, mask_padding=True)
    trainer = IPSTrainer(conf)
    predictor = Predictor(conf, trainer=trainer)
    n = 20
    exported = export_predictor(predictor, batch_size=conf.B, n_patches=n)
    model = ExportedPredictor(
        __import__("jax").export.deserialize(
            bytearray(exported.serialize())))

    patches = _patches(conf, n)
    mask = np.ones((conf.B, n), bool)
    mask[:, 15:] = False
    out = model.predict(patches, mask)
    live = predictor.predict(patches, mask)
    np.testing.assert_array_equal(out["selected_idx"], live["selected_idx"])
    np.testing.assert_allclose(out["metastases"], live["metastases"],
                               rtol=0, atol=1e-5)


def test_exported_rejects_wrong_shape(tiny_conf):
    conf = tiny_conf
    predictor = Predictor(conf, trainer=IPSTrainer(conf))
    exported = export_predictor(predictor, batch_size=conf.B)
    model = ExportedPredictor(exported)
    bad = _patches(conf)[: conf.B - 1]
    try:
        model.predict(bad)
    except ValueError as e:
        assert "re-export" in str(e)
    else:
        raise AssertionError("shape mismatch not rejected")
