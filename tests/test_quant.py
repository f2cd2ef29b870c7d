"""int8 selection encoder: arithmetic exactness + ranking fidelity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ips_tpu.models.quant import (_quant_act, _quant_kernel, _qconv,
                                  make_quant_encode_fn)


class TestQuantArithmetic:
    def test_int8_conv_matches_dequantized_float_conv(self, np_rng):
        """The int32-accumulated int8 conv must equal the float conv of
        the same quantized operands exactly (int8 x int8 sums of <=576
        terms fit int32 with no rounding)."""
        x = jnp.asarray(np_rng.standard_normal((4, 9, 9, 16)), jnp.float32)
        k = jnp.asarray(np_rng.standard_normal((3, 3, 16, 8)) * 0.2,
                        jnp.float32)
        xq, s_x = _quant_act(x)
        kq, s_k = _quant_kernel(k)
        got = _qconv(x, k)
        dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        want = jax.lax.conv_general_dilated(
            xq.astype(jnp.float32) * s_x,
            kq.astype(jnp.float32) * s_k[None, None, None],
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=dn)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_quant_scales_are_symmetric_and_bounded(self, np_rng):
        x = jnp.asarray(np_rng.standard_normal((3, 5, 5, 4)), jnp.float32)
        q, s = _quant_act(x)
        assert q.dtype == jnp.int8
        assert np.abs(np.asarray(q)).max() <= 127
        np.testing.assert_allclose(float(jnp.max(jnp.abs(x))),
                                   float(s) * 127.0, rtol=1e-5)


class TestQuantEncoder:
    @pytest.fixture()
    def trainer(self, tiny_conf, rng):
        from ips_tpu.train.steps import IPSTrainer
        return IPSTrainer(tiny_conf.replace(donate_buffers=False), rng=rng)

    def test_embeddings_close_to_full_precision(self, trainer, rng):
        """Per-patch embeddings from the int8 path must track the fp path
        (cosine similarity — ranking is what selection consumes)."""
        conf = trainer.conf
        x = jax.random.uniform(rng, (2, 6, *conf.patch_size, 1))
        enc_fp, _ = trainer._enc_score_fns(trainer.state.params,
                                           trainer.state.batch_stats)
        enc_q = make_quant_encode_fn(trainer.state.params,
                                     trainer.state.batch_stats, conf)
        a = np.asarray(enc_fp(x)).reshape(-1, conf.D)
        b = np.asarray(enc_q(x)).reshape(-1, conf.D)
        cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1)
                                * np.linalg.norm(b, axis=1) + 1e-9)
        assert cos.min() > 0.98, f"min cosine {cos.min():.4f}"

    def test_selection_jaccard_vs_full_precision(self, trainer, rng):
        """The int8-scored selection must pick (nearly) the same set."""
        from ips_tpu.ops.selection import ips_select
        conf = trainer.conf
        patches = jax.random.uniform(rng, (4, conf.N, *conf.patch_size, 1))
        enc_fp, score = trainer._enc_score_fns(trainer.state.params,
                                               trainer.state.batch_stats)
        enc_q = make_quant_encode_fn(trainer.state.params,
                                     trainer.state.batch_stats, conf)
        pos = trainer._pos_table_const()
        a = ips_select(enc_fp, score, patches, M=conf.M, I=conf.I,
                       pos_table=pos)
        b = ips_select(enc_q, score, patches, M=conf.M, I=conf.I,
                       pos_table=pos)
        ja = []
        for r in range(4):
            sa = set(np.asarray(a.mem_idx)[r].tolist())
            sb = set(np.asarray(b.mem_idx)[r].tolist())
            ja.append(len(sa & sb) / len(sa | sb))
        assert np.mean(ja) >= 0.5, f"selection diverged: {ja}"

    def test_trainer_switch_and_validation(self, tiny_conf, rng):
        from ips_tpu.train.steps import IPSTrainer
        conf = tiny_conf.replace(select_dtype="int8", donate_buffers=False)
        trainer = IPSTrainer(conf, rng=rng)
        patches = jax.random.uniform(rng, (2, conf.N, *conf.patch_size, 1))
        mem_patch, mem_pos, mem_idx, mem_mask = trainer.select(patches)
        assert mem_patch.shape == (2, conf.M, *conf.patch_size, 1)
        assert np.asarray(mem_idx).max() < conf.N
        with pytest.raises(ValueError, match="select_dtype"):
            tiny_conf.replace(select_dtype="int4")
        with pytest.raises(ValueError, match="projector"):
            tiny_conf.replace(select_dtype="int8", is_image=False,
                              n_chan_in=32)
