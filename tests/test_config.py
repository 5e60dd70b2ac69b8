"""Config system: the REFERENCE's shipped YAMLs load and instantiate through
the alias table; dot overrides; yaml inheritance."""

import os

import pytest

from versband_tpu.utils.config import (
    Config, TARGET_ALIASES, apply_dot_overrides, get_obj_from_str,
    instantiate_from_config, load_config, merge_configs)

REF = "/root/reference/configs"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not present")
def test_reference_vocal2music_yaml_instantiates():
    cfg = load_config(f"{REF}/vocal2music.yaml")
    model = instantiate_from_config(cfg["model"])
    from versband_tpu.models.cfm import CFM
    from versband_tpu.models.dit import BandMoeDiT

    assert isinstance(model, CFM)
    assert isinstance(model.model, BandMoeDiT)
    assert model.model.hidden_size == 768 and model.model.depth == 4
    assert model.model.num_experts == 4
    # frozen VAE attached with the shipped ddconfig
    assert model.first_stage.embed_dim == 20
    assert model.scale_by_std is True


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not present")
def test_reference_ae_accomp_yaml_instantiates():
    cfg = load_config(f"{REF}/ae_accomp.yaml")
    params = dict(cfg["model"]["params"])
    loss = instantiate_from_config(params["lossconfig"])
    from versband_tpu.train.gan_losses import VAEGANLoss

    assert isinstance(loss, VAEGANLoss)
    assert loss.disc_start == 80001 and loss.disc_loss == "mse"
    assert loss.r1_reg_weight == 3

    from versband_tpu.models.autoencoder import AutoencoderKL

    vae = AutoencoderKL(embed_dim=params["embed_dim"],
                        ddconfig=params["ddconfig"])
    assert vae.ddconfig["ch"] == 384


def test_all_aliases_resolve():
    unresolved = []
    for src, dst in TARGET_ALIASES.items():
        try:
            get_obj_from_str(src)
        except Exception as e:
            unresolved.append((src, str(e)))
    assert not unresolved, unresolved


def test_dot_overrides_and_merge():
    cfg = Config.wrap({"model": {"params": {"lr": 1.0}}})
    out = apply_dot_overrides(cfg, ["model.params.lr=2.5",
                                    "model.params.new=[1,2]"])
    assert out["model"]["params"]["lr"] == 2.5
    assert out["model"]["params"]["new"] == [1, 2]
    merged = merge_configs({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}})
    assert merged["a"] == {"b": 9, "c": 2}
