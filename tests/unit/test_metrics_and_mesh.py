import io
import json

import jax.numpy as jnp
import numpy as np
import pytest

from molvax.config import MeshConfig
from molvax.parallel import make_mesh
from molvax.train.metrics import MetricsLogger


def test_metrics_logger_jsonl_and_console(tmp_path):
    path = str(tmp_path / "m.jsonl")
    stream = io.StringIO()
    logger = MetricsLogger(path, stream=stream)
    row = logger.log(
        5, {"loss": jnp.float32(1.5), "acc": jnp.float32(0.25)}, extra={"tag": "x"}
    )
    logger.close()
    assert row["step"] == 5 and row["loss"] == 1.5 and row["tag"] == "x"
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["acc"] == 0.25
    assert "wall_s" in lines[0]
    assert "step 5" in stream.getvalue()


def test_metrics_logger_silent():
    logger = MetricsLogger(None, stream=False)
    row = logger.log(1, {"loss": jnp.float32(2.0)})
    assert row["loss"] == 2.0
    logger.close()


def test_make_mesh_too_many_devices(devices):
    with pytest.raises(ValueError, match="needs"):
        make_mesh(MeshConfig(data_axis=16, model_axis=1), devices=devices)


def test_make_mesh_respects_config(devices):
    mesh = make_mesh(MeshConfig(data_axis=4, model_axis=2), devices=devices)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_apply_overrides_unknown_key():
    from molvax.config import apply_overrides, get_preset

    with pytest.raises(TypeError):  # dataclasses.replace rejects unknown field
        apply_overrides(get_preset("chemvae_5k"), {"train.nope": 1})
    with pytest.raises(AttributeError):  # unknown intermediate node
        apply_overrides(get_preset("chemvae_5k"), {"nope.x": 1})
