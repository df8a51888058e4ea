"""Sharded checkpointing end-to-end (VERDICT r4 next 3).

`io/checkpoint.py` is "sharding-aware" via orbax — these tests make that a
verified behavior instead of a docstring claim, on the 8-fake-device CPU
mesh (the stand-in for a v5e-8, SURVEY.md 4.5):

  * save under an 8-device mesh -> restore onto the SAME mesh: restored
    arrays carry the template's shardings and the continued trajectory is
    BIT-identical to the uninterrupted run (same topology = same XLA
    program = exact).
  * elasticity both ways (8 -> 1 and 1 -> 8): the restored VALUES are
    bit-identical to what was saved; the continued trajectories agree to
    the same fp32 tolerance the DP-vs-single-device equality tests use
    (cross-topology reduction order differs, so bitwise equality across
    device counts is not a meaningful target — see
    test_dp_step_matches_single_device).

In this DP design params/opt-state are REPLICATED over the mesh (P());
batches are the only sharded arrays and are never checkpointed. Elastic
restore therefore only has to re-lay-out replicated leaves, which orbax's
StandardRestore does from the template's shardings.
"""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
from molvax.data import DEFAULT_CHARSET, synthetic_dataset
from molvax.io import checkpoint as ckpt_io
from molvax.parallel import make_mesh, replicate, shard_batch
from molvax.train import init_state, make_train_step


def tiny_cfg(batch_size=16):
    return Config(
        model=ModelConfig(
            max_len=32,
            charset_size=DEFAULT_CHARSET.size,
            latent_dim=12,
            enc_hidden=16,
            gru_hidden=16,
            gru_layers=2,
        ),
        train=TrainConfig(batch_size=batch_size, learning_rate=1e-3),
        data=DataConfig(max_len=32),
    )


def _leaves(state):
    return [np.asarray(x) for x in jax.tree.leaves(ckpt_io._to_savable(state))]


def _assert_state_equal(a, b, exact=True, rtol=2e-5, atol=2e-6):
    la, lb = _leaves(a), _leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if exact:
            np.testing.assert_array_equal(x, y)
        else:
            np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)


def _advance(cfg, state, batches):
    """Run the jitted step over a list of host batches. The step donates its
    input state, so the caller must not reuse `state` afterwards."""
    step = make_train_step(cfg)
    m = None
    for codes in batches:
        state, m = step(state, codes, None)
    jax.block_until_ready(state.params)
    return state, m


def _batches(cfg, n, seed=0, mesh=None):
    ds = synthetic_dataset(n * cfg.train.batch_size, max_len=32, seed=seed)
    out = []
    for i in range(n):
        codes = ds.codes[i * cfg.train.batch_size : (i + 1) * cfg.train.batch_size]
        out.append(
            shard_batch(mesh, codes) if mesh is not None else jnp.asarray(codes)
        )
    return out


def test_save_mesh8_restore_mesh8_bitexact(devices, tmp_path):
    """Same-topology resume is exact: restored state == saved state bitwise,
    and one more step from each is bitwise identical."""
    cfg = tiny_cfg()
    mesh = make_mesh(devices=devices)
    state = replicate(mesh, init_state(cfg))
    state, _ = _advance(cfg, state, _batches(cfg, 2, seed=0, mesh=mesh))

    mgr = ckpt_io.make_manager(str(tmp_path / "ck"))
    ckpt_io.save(mgr, 2, state)
    mgr.wait_until_finished()

    template = replicate(mesh, init_state(cfg))
    restored = ckpt_io.restore_latest(mgr, template)
    assert restored is not None
    assert int(jax.device_get(restored.step)) == 2
    for leaf in jax.tree.leaves(restored.params):
        assert leaf.sharding.is_fully_replicated
    _assert_state_equal(state, restored, exact=True)

    # continued trajectories: same topology -> same program -> bit-identical
    nxt = _batches(cfg, 2, seed=9, mesh=mesh)
    cont_a, _ = _advance(cfg, state, nxt)
    cont_b, _ = _advance(cfg, restored, nxt)
    _assert_state_equal(cont_a, cont_b, exact=True)


def test_save_mesh8_restore_1device(devices, tmp_path):
    """Elastic down-restore (8 -> 1): the v5e-8 -> single-chip recovery
    scenario. Values restore exactly; continued training matches the
    8-device continuation to DP-equality tolerance."""
    cfg = tiny_cfg()
    mesh = make_mesh(devices=devices)
    state8 = replicate(mesh, init_state(cfg))
    state8, _ = _advance(cfg, state8, _batches(cfg, 2, seed=1, mesh=mesh))

    mgr = ckpt_io.make_manager(str(tmp_path / "ck"))
    ckpt_io.save(mgr, 2, state8)
    mgr.wait_until_finished()

    mesh1 = make_mesh(devices=devices[:1])
    template = replicate(mesh1, init_state(cfg))
    restored = ckpt_io.restore_latest(mgr, template)
    assert restored is not None
    _assert_state_equal(state8, restored, exact=True)
    assert len(jax.tree.leaves(restored.params)[0].sharding.device_set) == 1

    nxt_np = _batches(cfg, 2, seed=8)  # host batches
    cont8, m8 = _advance(
        cfg, state8, [shard_batch(mesh, np.asarray(b)) for b in nxt_np]
    )
    cont1, m1 = _advance(cfg, restored, nxt_np)
    _assert_state_equal(cont8, cont1, exact=False)
    np.testing.assert_allclose(
        float(m8["loss"]), float(m1["loss"]), rtol=1e-5, atol=1e-6
    )


def test_save_1device_restore_mesh8(devices, tmp_path):
    """Elastic up-restore (1 -> 8): a single-chip dev checkpoint scales out
    onto the mesh; restored leaves land replicated over all 8 devices."""
    cfg = tiny_cfg()
    state1 = init_state(cfg)
    state1, _ = _advance(cfg, state1, _batches(cfg, 2, seed=2))

    mgr = ckpt_io.make_manager(str(tmp_path / "ck"))
    ckpt_io.save(mgr, 2, state1)
    mgr.wait_until_finished()

    mesh = make_mesh(devices=devices)
    template = replicate(mesh, init_state(cfg))
    restored = ckpt_io.restore_latest(mgr, template)
    assert restored is not None
    _assert_state_equal(state1, restored, exact=True)
    leaf = jax.tree.leaves(restored.params)[0]
    assert leaf.sharding.is_fully_replicated
    assert len(leaf.sharding.device_set) == 8

    nxt_np = _batches(cfg, 2, seed=7)
    cont1, m1 = _advance(cfg, state1, nxt_np)
    cont8, m8 = _advance(
        cfg, restored, [shard_batch(mesh, np.asarray(b)) for b in nxt_np]
    )
    _assert_state_equal(cont1, cont8, exact=False)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=1e-5, atol=1e-6
    )


def test_train_loop_checkpoint_under_mesh(devices, tmp_path):
    """The full train() loop checkpoints and resumes under an explicit
    8-device mesh (the path a preempted v5e-8 run takes), continuing to the
    target step with the restored — not fresh — parameters."""
    from molvax.train import train

    ckpt_dir = str(tmp_path / "ck")
    cfg = tiny_cfg()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, checkpoint_dir=ckpt_dir, checkpoint_every=3, log_every=0
        ),
    )
    mesh = make_mesh(devices=devices)
    ds = synthetic_dataset(64, max_len=32, seed=3)
    train(cfg, dataset=ds, mesh=mesh, max_steps=4, verbose=False)

    state2, _ = train(cfg, dataset=ds, mesh=mesh, max_steps=6, verbose=False)
    assert int(jax.device_get(state2.step)) == 6
    fresh = init_state(cfg)
    p_resumed = np.asarray(jax.tree.leaves(state2.params)[0])
    p_fresh = np.asarray(jax.tree.leaves(fresh.params)[0])
    assert not np.allclose(p_resumed, p_fresh)
