"""Config loading: shipped YAMLs, overrides, validation."""

import os

import pytest

from ips_tpu.config import Config, config_from_dict, load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "config")


@pytest.mark.parametrize("name,expect", [
    ("mnist_config.yml", dict(N=900, M=100, I=100, n_token=4, D=128,
                              use_pos=True, n_chan_in=1, n_res_blocks=2)),
    ("traffic_config.yml", dict(N=192, M=10, I=32, n_token=1, D=512,
                                use_pos=False, n_chan_in=3, n_res_blocks=4)),
    ("camelyon_config.yml", dict(M=5000, I=5000, n_token=1, D=512,
                                 is_image=False, n_chan_in=2048, B_seq=1)),
])
def test_shipped_configs_load(name, expect):
    conf = load_config(os.path.join(CONFIG_DIR, name))
    for k, v in expect.items():
        assert getattr(conf, k) == v, (name, k)
    assert conf.wd == 0.1 and conf.eps == 1e-6


def test_overrides():
    conf = load_config(os.path.join(CONFIG_DIR, "mnist_config.yml"),
                       ["B=8", "B_seq=8", "lr=0.01", "shuffle=false",
                        "patch_size=[25, 25]"])
    assert conf.B == 8 and conf.B_seq == 8 and conf.lr == 0.01
    assert conf.shuffle is False
    assert conf.patch_size == (25, 25)


def test_task_ordering():
    conf = load_config(os.path.join(CONFIG_DIR, "mnist_config.yml"))
    names = [t.name for t in conf.task_list]
    assert names == ["majority", "max", "top", "multi"]
    assert [t.id for t in conf.task_list] == [0, 1, 2, 3]


def test_validation_errors():
    base = load_config(os.path.join(CONFIG_DIR, "mnist_config.yml"))
    with pytest.raises(ValueError):
        base.replace(enc_type="vgg")
    with pytest.raises(ValueError):
        base.replace(n_res_blocks=3)
    with pytest.raises(ValueError):
        base.replace(shuffle_style="none")
    with pytest.raises(ValueError):
        config_from_dict(dict(bogus_key=1))
    with pytest.raises(ValueError):
        base.replace(tasks={})


def test_unknown_yaml_key(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("definitely_not_a_key: 1\n"
                 "tasks:\n  task0: {id: 0, name: a, act_fn: softmax, "
                 "metric: accuracy}\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(str(p))


def test_preencode_select_accepts_auto_and_bools():
    from ips_tpu.config import config_from_dict
    base = dict(N=16, M=4, I=4,
                tasks={"t": {"id": 0, "name": "y", "act_fn": "softmax",
                             "metric": "accuracy"}})
    assert config_from_dict(base).preencode_select == "auto"
    assert config_from_dict({**base, "preencode_select": True}
                            ).preencode_select is True
    with pytest.raises(ValueError, match="preencode_select"):
        config_from_dict({**base, "preencode_select": "always"})
    # explicit True under the approximate CP merge is rejected ('auto' is
    # fine — it stays off there); exact CP (the default) supports it
    with pytest.raises(ValueError, match="local_merge"):
        config_from_dict({**base, "preencode_select": True, "mesh_patch": 2,
                          "cp_select": "local_merge", "M": 4, "N": 16})
    config_from_dict({**base, "preencode_select": True, "mesh_patch": 2,
                      "M": 4, "N": 16})
    config_from_dict({**base, "mesh_patch": 2})


def test_select_unroll_rejected_where_silently_ignored():
    """ADVICE r2: select_unroll must error (like preencode_select) on the
    CP and streaming paths instead of being silently dropped."""
    from ips_tpu.config import config_from_dict
    base = dict(N=16, M=4, I=4,
                tasks={"t": {"id": 0, "name": "y", "act_fn": "softmax",
                             "metric": "accuracy"}})
    with pytest.raises(ValueError, match="local_merge"):
        config_from_dict({**base, "select_unroll": 2, "mesh_patch": 2,
                          "cp_select": "local_merge"})
    # exact CP (default) runs the base scan, which honors the knob
    config_from_dict({**base, "select_unroll": 2, "mesh_patch": 2})
    with pytest.raises(ValueError, match="eager"):
        config_from_dict({**base, "select_unroll": 2, "eager": False})
    config_from_dict({**base, "select_unroll": 2})


def test_preencode_auto_resolves_on_table_size():
    """'auto' flips on only when the resident patch table exceeds VMEM."""
    import jax
    import jax.numpy as jnp

    from ips_tpu.config import config_from_dict
    from ips_tpu.train.steps import IPSTrainer

    conf = config_from_dict(dict(
        N=900, M=100, I=100, B=16, B_seq=16, patch_size=[50, 50],
        patch_stride=[50, 50],
        tasks={"t": {"id": 0, "name": "y", "act_fn": "softmax",
                     "metric": "accuracy"}}))
    trainer = IPSTrainer.__new__(IPSTrainer)   # shape logic only
    trainer.conf = conf

    small = jax.ShapeDtypeStruct((16, 900, 50, 50, 1), jnp.bfloat16)
    big = jax.ShapeDtypeStruct((16, 3600, 50, 50, 1), jnp.bfloat16)
    assert trainer._resolve_preencode(small) is False   # 72 MB: in VMEM
    assert trainer._resolve_preencode(big) is True      # 288 MB: cliff

    trainer.conf = conf.replace(preencode_select=False)
    assert trainer._resolve_preencode(big) is False
    trainer.conf = conf.replace(preencode_select=True)
    assert trainer._resolve_preencode(small) is True
