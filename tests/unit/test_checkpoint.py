import pytest
import dataclasses

import jax
import numpy as np

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET
from molvax.io import checkpoint as ckpt
from molvax.train import init_state


def tiny_cfg():
    return Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=12, gru_layers=1,
        ),
        train=TrainConfig(batch_size=4),
        data=DataConfig(max_len=32),
    )


@pytest.mark.slow
def test_save_restore_roundtrip(tmp_path):
    cfg = tiny_cfg()
    state = init_state(cfg)
    manager = ckpt.make_manager(str(tmp_path / "ck"), keep=2)
    ckpt.save(manager, 5, state)
    manager.wait_until_finished()

    # restore into a differently-initialized template
    template = init_state(dataclasses.replace(cfg, train=TrainConfig(seed=99)))
    restored = ckpt.restore_latest(manager, template)
    assert restored is not None
    assert int(jax.device_get(restored.step)) == 0  # step saved from state
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # PRNG key round-trips as a usable typed key
    k1 = jax.random.fold_in(state.base_key, 1)
    k2 = jax.random.fold_in(restored.base_key, 1)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k1)), np.asarray(jax.random.key_data(k2))
    )


@pytest.mark.slow
def test_restore_tolerates_added_start_token(tmp_path):
    """ADVICE r2: a checkpoint written before ``learned_start`` flipped on in
    a preset lacks ``decoder/start_token`` (and its Adam moments); restoring
    into the new state template must graft the saved leaves and keep the
    fresh zero-init for the new param instead of failing on tree mismatch."""
    cfg_old = tiny_cfg()
    state_old = init_state(cfg_old)
    manager = ckpt.make_manager(str(tmp_path / "ck"), keep=2)
    ckpt.save(manager, 7, state_old)
    manager.wait_until_finished()

    cfg_new = dataclasses.replace(
        cfg_old, model=dataclasses.replace(cfg_old.model, learned_start=True)
    )
    template = init_state(cfg_new, key=jax.random.key(123))
    restored = ckpt.restore_latest(manager, template)
    assert restored is not None
    # saved leaves came back ...
    np.testing.assert_array_equal(
        np.asarray(state_old.params["encoder"]["linear_mu"]["w"]),
        np.asarray(restored.params["encoder"]["linear_mu"]["w"]),
    )
    # ... and the new param kept its (zero) init
    assert "start_token" in restored.params["decoder"]
    np.testing.assert_array_equal(
        np.asarray(restored.params["decoder"]["start_token"]),
        np.zeros(cfg_new.model.charset_size, np.float32),
    )
    # optimizer state trees match the new params (resume can keep training)
    assert (
        jax.tree.structure(restored.params).num_leaves
        == jax.tree.structure(template.params).num_leaves
    )


def test_restore_latest_none_when_empty(tmp_path):
    manager = ckpt.make_manager(str(tmp_path / "empty"))
    assert ckpt.restore_latest(manager, init_state(tiny_cfg())) is None


def test_keep_limit(tmp_path):
    cfg = tiny_cfg()
    state = init_state(cfg)
    manager = ckpt.make_manager(str(tmp_path / "ck"), keep=2)
    for step in (1, 2, 3):
        ckpt.save(manager, step, state)
    manager.wait_until_finished()
    assert manager.latest_step() == 3
    assert set(manager.all_steps()) == {2, 3}


@pytest.mark.slow
def test_restore_rejects_incompatible_architecture(tmp_path):
    """A checkpoint from a different architecture must fail loudly at
    restore time, not splice mismatched arrays into the template and
    blow up later mid-train (round-3 review finding)."""
    cfg = tiny_cfg()
    state = init_state(cfg)
    manager = ckpt.make_manager(str(tmp_path / "ck"), keep=1)
    ckpt.save(manager, 1, state)
    manager.wait_until_finished()

    wider = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, gru_hidden=24)
    )
    template = init_state(wider)
    with pytest.raises(ValueError, match="incompatible"):
        ckpt.restore_latest(manager, template)
