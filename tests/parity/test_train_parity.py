"""End-to-end training parity vs the PyTorch twin (the ±1% ELBO target,
BASELINE.json:5): identical weights, identical batches, eps_scale=0 (so the
forward is deterministic in both frameworks), same Adam hyperparameters ->
loss trajectories must track within fp32 drift over several optimizer steps.
"""

import pytest

pytestmark = pytest.mark.slow

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os, sys  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from bench.torch_twin.model import MolecularVAETwin, vae_loss_twin  # noqa: E402
from molvax.config import Config, DataConfig, KLScheduleConfig, ModelConfig, TrainConfig  # noqa: E402
from molvax.data import DEFAULT_CHARSET, synthetic_dataset  # noqa: E402
from molvax.data.featurize import one_hot  # noqa: E402
from molvax.io.torch_compat import from_torch_state_dict  # noqa: E402
from molvax.train import init_state, make_train_step  # noqa: E402

LR = 1e-3
STEPS = 6
BATCH = 16


def _cfg() -> Config:
    return Config(
        model=ModelConfig(
            max_len=40,
            charset_size=DEFAULT_CHARSET.size,
            latent_dim=16,
            conv_kernels=(9, 9, 11),
            enc_hidden=24,
            gru_hidden=20,
            gru_layers=2,
            eps_scale=0.0,  # deterministic forward: z = mu
        ),
        train=TrainConfig(
            batch_size=BATCH,
            learning_rate=LR,
            kl=KLScheduleConfig(kind="constant", beta_max=1.0),
        ),
        data=DataConfig(max_len=40),
    )


def test_training_trajectory_tracks_torch():
    cfg = _cfg()
    torch.manual_seed(0)
    twin = MolecularVAETwin(
        max_len=cfg.model.max_len,
        charset_size=cfg.model.charset_size,
        latent_dim=cfg.model.latent_dim,
        conv_kernels=cfg.model.conv_kernels,
        enc_hidden=cfg.model.enc_hidden,
        gru_hidden=cfg.model.gru_hidden,
        gru_layers=cfg.model.gru_layers,
        eps_scale=0.0,
    )
    params = from_torch_state_dict(twin.state_dict(), cfg.model)

    # identical batches
    ds = synthetic_dataset(BATCH * STEPS, max_len=cfg.model.max_len, seed=0)
    batches = [ds.codes[i * BATCH : (i + 1) * BATCH] for i in range(STEPS)]

    # --- molvax side
    state = init_state(cfg)
    state = state._replace(params=params, opt_state=None)
    import optax

    from molvax.train.loop import make_optimizer

    opt = make_optimizer(cfg)
    state = state._replace(opt_state=opt.init(params))
    step = make_train_step(cfg)
    jax_losses = []
    for b in batches:
        state, metrics = step(state, jnp.asarray(b), None)
        jax_losses.append(float(metrics["loss"]))

    # --- torch side (identical math: per-sample-sum ELBO, batch mean)
    optim = torch.optim.Adam(twin.parameters(), lr=LR)
    torch_losses = []
    for b in batches:
        x = torch.from_numpy(
            np.asarray(one_hot(jnp.asarray(b), cfg.model.charset_size))
        )
        codes_t = torch.from_numpy(b.astype(np.int64))
        logits, mu, logvar, _, _ = twin(x, noise=True)  # eps_scale=0 -> z=mu
        loss, _, _ = vae_loss_twin(twin, logits, codes_t, mu, logvar, beta=1.0)
        optim.zero_grad()
        loss.backward()
        optim.step()
        torch_losses.append(float(loss))

    # Step-0 losses are identical weights -> near-exact; later steps may
    # drift with fp32 accumulation order but must stay well within 1%.
    assert jax_losses[0] == pytest.approx(torch_losses[0], rel=2e-4)
    for j, t in zip(jax_losses, torch_losses):
        assert j == pytest.approx(t, rel=1e-2), (jax_losses, torch_losses)
    # and training must actually be progressing
    assert jax_losses[-1] < jax_losses[0]


def test_property_joint_trajectory_tracks_torch():
    """Multi-task ELBO (recon + KL + property MSE) also tracks the twin."""
    import dataclasses

    from molvax.data import surrogate_properties, DEFAULT_CHARSET as CS

    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, n_properties=3)
    )
    torch.manual_seed(1)
    twin = MolecularVAETwin(
        max_len=cfg.model.max_len,
        charset_size=cfg.model.charset_size,
        latent_dim=cfg.model.latent_dim,
        conv_kernels=cfg.model.conv_kernels,
        enc_hidden=cfg.model.enc_hidden,
        gru_hidden=cfg.model.gru_hidden,
        gru_layers=cfg.model.gru_layers,
        eps_scale=0.0,
        n_properties=3,
        property_hidden=cfg.model.property_hidden,
    )
    params = from_torch_state_dict(twin.state_dict(), cfg.model)

    ds = synthetic_dataset(BATCH * 4, max_len=cfg.model.max_len, seed=1)
    props = surrogate_properties(ds.codes, CS)
    batches = [
        (ds.codes[i * BATCH : (i + 1) * BATCH], props[i * BATCH : (i + 1) * BATCH])
        for i in range(4)
    ]

    import optax

    from molvax.train.loop import make_optimizer

    state = init_state(cfg)
    opt = make_optimizer(cfg)
    state = state._replace(params=params, opt_state=opt.init(params))
    step = make_train_step(cfg)
    jax_losses = []
    for b, p in batches:
        state, metrics = step(state, jnp.asarray(b), jnp.asarray(p))
        jax_losses.append(float(metrics["loss"]))

    optim = torch.optim.Adam(twin.parameters(), lr=LR)
    torch_losses = []
    for b, p in batches:
        x = torch.from_numpy(
            np.asarray(one_hot(jnp.asarray(b), cfg.model.charset_size))
        )
        codes_t = torch.from_numpy(b.astype(np.int64))
        logits, mu, logvar, z, pred = twin(x, noise=True)
        loss, _, _ = vae_loss_twin(twin, logits, codes_t, mu, logvar, beta=1.0)
        prop_mse = ((pred - torch.from_numpy(p)) ** 2).sum(dim=-1).mean()
        loss = loss + cfg.train.property_loss_weight * prop_mse
        optim.zero_grad()
        loss.backward()
        optim.step()
        torch_losses.append(float(loss))

    assert jax_losses[0] == pytest.approx(torch_losses[0], rel=2e-4)
    for j, t in zip(jax_losses, torch_losses):
        assert j == pytest.approx(t, rel=1e-2), (jax_losses, torch_losses)
