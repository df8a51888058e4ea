"""Free-running decode-quality options (VERDICT r1 weak 6): learned start
token, scheduled sampling, temperature sweep."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from molvax.config import ModelConfig, TrainConfig
from molvax.nn import vae
from molvax.nn.decoder import init_decoder_params, teacher_inputs
from molvax.train.schedules import ss_prob_at

CFG = ModelConfig(
    max_len=12, charset_size=8, latent_dim=6, conv_channels=(2,),
    conv_kernels=(3,), enc_hidden=10, gru_hidden=9, gru_layers=2,
)


def test_start_token_param_only_when_enabled():
    cfg_on = dataclasses.replace(CFG, learned_start=True)
    p_off = init_decoder_params(jax.random.key(0), CFG)
    p_on = init_decoder_params(jax.random.key(0), cfg_on)
    assert "start_token" not in p_off
    assert p_on["start_token"].shape == (CFG.charset_size,)
    # zero init == exact reference behavior at step 0
    np.testing.assert_array_equal(np.asarray(p_on["start_token"]), 0.0)


def test_teacher_inputs_start_row():
    B, T, C = 3, 5, 8
    z_emb = jnp.ones((B, 6))
    x = jax.nn.one_hot(jnp.arange(T)[None, :].repeat(B, 0) % C, C)
    start = jnp.arange(C, dtype=jnp.float32)
    seq_zero = teacher_inputs(CFG, z_emb, x)
    seq_start = teacher_inputs(CFG, z_emb, x, start)
    # step 0's char slice: zeros vs the start vector; steps >0 identical
    np.testing.assert_array_equal(np.asarray(seq_zero[:, 0, 6:]), 0.0)
    np.testing.assert_allclose(
        np.asarray(seq_start[:, 0, 6:]), np.tile(np.arange(C), (B, 1))
    )
    np.testing.assert_array_equal(
        np.asarray(seq_zero[:, 1:]), np.asarray(seq_start[:, 1:])
    )


def test_ss_schedule_ramp():
    t = TrainConfig(scheduled_sampling=0.4, scheduled_sampling_warmup=100)
    assert float(ss_prob_at(t, 0)) == 0.0
    np.testing.assert_allclose(float(ss_prob_at(t, 50)), 0.2, rtol=1e-6)
    np.testing.assert_allclose(float(ss_prob_at(t, 100)), 0.4, rtol=1e-6)
    np.testing.assert_allclose(float(ss_prob_at(t, 10_000)), 0.4, rtol=1e-6)  # clamped


def test_forward_with_scheduled_sampling_runs_and_differs():
    cfg = CFG
    params = vae.init_vae_params(jax.random.key(0), cfg)
    codes = jax.random.randint(jax.random.key(1), (4, cfg.max_len), 0, cfg.charset_size)
    key = jax.random.key(2)
    out_tf = vae.forward(params, cfg, key, codes)
    out_ss0 = vae.forward(params, cfg, key, codes, ss_prob=jnp.float32(0.0))
    out_ss1 = vae.forward(params, cfg, key, codes, ss_prob=jnp.float32(1.0))
    # ss_prob=0 mixes nothing: identical logits to pure teacher forcing
    np.testing.assert_allclose(
        np.asarray(out_ss0.logits), np.asarray(out_tf.logits), atol=1e-6
    )
    # ss_prob=1 feeds the model's own (untrained, different) predictions
    assert not np.allclose(np.asarray(out_ss1.logits), np.asarray(out_tf.logits))


def test_forward_with_word_dropout_runs_and_differs():
    """wd_prob=0 matches pure teacher forcing; wd_prob=1 zeroes every
    teacher input (decoder sees only z + start); grads stay finite."""
    cfg = CFG
    params = vae.init_vae_params(jax.random.key(0), cfg)
    codes = jax.random.randint(jax.random.key(1), (4, cfg.max_len), 0, cfg.charset_size)
    key = jax.random.key(2)
    out_tf = vae.forward(params, cfg, key, codes)
    out_wd0 = vae.forward(params, cfg, key, codes, wd_prob=jnp.float32(0.0))
    out_wd1 = vae.forward(params, cfg, key, codes, wd_prob=jnp.float32(1.0))
    np.testing.assert_allclose(
        np.asarray(out_wd0.logits), np.asarray(out_tf.logits), atol=1e-6
    )
    assert not np.allclose(np.asarray(out_wd1.logits), np.asarray(out_tf.logits))

    def loss(p):
        out = vae.forward(p, cfg, key, codes, wd_prob=jnp.float32(0.5))
        from molvax.train.loss import vae_loss

        l, _ = vae_loss(
            cfg, out.logits, codes.astype(jnp.int32), out.mu, out.logvar,
            jnp.float32(1.0), kl=out.kl,
        )
        return l

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_scheduled_sampling_grads_finite():
    cfg = CFG
    params = vae.init_vae_params(jax.random.key(0), cfg)
    codes = jax.random.randint(jax.random.key(1), (4, cfg.max_len), 0, cfg.charset_size)

    def loss(p):
        out = vae.forward(p, cfg, jax.random.key(2), codes, ss_prob=jnp.float32(0.5))
        from molvax.train.loss import vae_loss

        l, _ = vae_loss(cfg, out.logits, codes, out.mu, out.logvar, jnp.float32(1.0))
        return l

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_generate_uses_learned_start():
    cfg = dataclasses.replace(CFG, learned_start=True)
    params = vae.init_vae_params(jax.random.key(0), cfg)
    # a big start-token perturbation must change free-running outputs
    from molvax.latent.sample import generate

    z = jax.random.normal(jax.random.key(1), (2, cfg.latent_dim))
    codes_a, _ = generate(params, cfg, z)
    params2 = jax.tree.map(lambda x: x, params)
    params2["decoder"]["start_token"] = (
        params["decoder"]["start_token"] + 100.0 * jnp.arange(cfg.charset_size)
    )
    codes_b, _ = generate(params2, cfg, z)
    assert not np.array_equal(np.asarray(codes_a), np.asarray(codes_b))


def test_train_step_with_ss_and_start_token():
    """End-to-end: one train step with both options on updates start_token."""
    from molvax.config import Config, DataConfig
    from molvax.train.loop import init_state, make_train_step

    cfg = Config(
        model=dataclasses.replace(CFG, learned_start=True),
        train=TrainConfig(
            batch_size=4, scheduled_sampling=0.3, scheduled_sampling_warmup=1
        ),
        data=DataConfig(n_synthetic=16, max_len=CFG.max_len),
    )
    state = init_state(cfg, jax.random.key(0))
    codes = jax.random.randint(jax.random.key(1), (4, CFG.max_len), 0, CFG.charset_size)
    step = make_train_step(cfg)
    state1, m1 = step(state, codes, None)
    state2, m2 = step(state1, codes, None)  # step>=1 -> ss_prob > 0 active
    assert np.isfinite(float(m2["loss"]))
    # start token receives gradient once training runs
    assert float(jnp.abs(state2.params["decoder"]["start_token"]).sum()) > 0.0


def test_temperature_sweep_keys():
    from molvax.config import Config, DataConfig
    from molvax.train.evaluate import temperature_sweep

    cfg = Config(model=CFG, train=TrainConfig(batch_size=4), data=DataConfig())
    params = vae.init_vae_params(jax.random.key(0), CFG)
    out = temperature_sweep(
        params, cfg, jax.random.key(1), temperatures=(0.7, 1.0), n=8
    )
    assert "gen_valid@0.7" in out and "gen_valid@1" in out
    assert all(np.isfinite(v) for v in out.values())
