"""CLI config-surface regressions.

The reference drives everything through hydra `key=value` overrides; one
subtle contract is `pretrain=null`: hydra/yaml coerce the token to None,
but every downstream consumer STRING-compares "null" (random-init
efficientnet features, finetuning.py:183, eval_ckpts.py:360). The CLIs
must map the coerced None back to the literal "null" before routing.
"""

import numpy as np

from heart_murmur_detection_tpu.cli.config import _coerce, parse_overrides
from heart_murmur_detection_tpu.cli.linear_eval import feature_name


def test_null_coerces_to_none():
    assert _coerce("null") is None
    assert _coerce("None") is None
    _, combos = parse_overrides(["pretrain=null"])
    assert combos[0]["pretrain"] is None


def test_feature_name_null_pretrain():
    # linear_eval.py names the random-init feature file "null1280"
    assert feature_name({"pretrain": None, "dim": 1280}) == "null1280"
    assert feature_name({"pretrain": "null", "dim": 1280}) == "null1280"
    assert feature_name({"pretrain": "operaCT", "dim": 768}) == "operaCT768"


def test_mesh_from_cli():
    """Shared dp/tp/param_sharding CLI contract: no mesh without dp/tp;
    param_sharding without a mesh is a config error (never a silent no-op);
    tp>1 defaults to megatron."""
    from heart_murmur_detection_tpu.parallel.mesh import mesh_from_cli

    assert mesh_from_cli({}) == (None, None)
    mesh, ps = mesh_from_cli({"dp": 4})
    assert mesh.axis_names == ("data",) and ps is None
    mesh, ps = mesh_from_cli({"dp": 2, "tp": 2})
    assert mesh.axis_names == ("data", "model") and ps == "megatron"
    mesh, ps = mesh_from_cli({"dp": 4, "param_sharding": "fsdp"})
    assert mesh.axis_names == ("data",) and ps == "fsdp"
    import pytest

    with pytest.raises(ValueError, match="requires a device mesh"):
        mesh_from_cli({"param_sharding": "fsdp"})


def test_finetune_cli_null_pretrain(monkeypatch, capsys):
    """cli.finetune pretrain=null must reach finetune_heart as the string
    "null" (drives the whole resolve -> route -> dispatch path)."""
    import heart_murmur_detection_tpu.cli.finetune as cli

    seen = {}

    def fake_finetune_heart(**kw):
        seen.update(kw)

        class R:
            test_auc = 0.5
            best_epoch = 0

        return R()

    monkeypatch.setattr(cli, "finetune_heart", fake_finetune_heart)
    cli.main(["task=pascal_A", "pretrain=null", "dim=1280", "n_run=1"])
    assert seen["pretrain"] == "null"
    assert seen["feat_dim"] == 1280
    assert np.isfinite(seen["l2_strength"])
    assert "auc mean" in capsys.readouterr().out
