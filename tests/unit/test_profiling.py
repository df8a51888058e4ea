import jax
import jax.numpy as jnp
import numpy as np

from molvax.train.profiling import annotate, cost_summary, step_timer


def test_cost_summary_matmul():
    a = jnp.ones((256, 256))
    cost = cost_summary(lambda a: a @ a, a)
    # 2*N^3 FLOPs for a square matmul (compiler may report MACs differently
    # but must be within 2x)
    assert cost["flops"] >= 256**3
    assert cost["bytes_accessed"] > 0
    assert cost["arithmetic_intensity"] > 0


def test_step_timer_runs():
    f = jax.jit(lambda x: (x * 2).sum())
    dt = step_timer(f, jnp.ones((64, 64)), steps=3, rounds=2)
    assert dt > 0


def test_annotate_contextmanager():
    with annotate("test-region"):
        x = jnp.ones((8, 8)) + 1
    assert float(x[0, 0]) == 2.0


def test_eval_every_logs_eval_metrics():
    from molvax.config import Config, DataConfig, ModelConfig, TrainConfig
    from molvax.data import DEFAULT_CHARSET, synthetic_dataset
    from molvax.train import train

    cfg = Config(
        model=ModelConfig(
            max_len=32, charset_size=DEFAULT_CHARSET.size, latent_dim=8,
            enc_hidden=12, gru_hidden=12, gru_layers=1,
        ),
        train=TrainConfig(
            batch_size=8, log_every=100, eval_every=5, eval_batches=2
        ),
        data=DataConfig(max_len=32, test_fraction=0.25),
    )
    ds = synthetic_dataset(64, max_len=32, seed=0)
    _, history = train(cfg, dataset=ds, max_steps=10, verbose=False)
    eval_rows = [h for h in history if "eval_loss" in h]
    assert len(eval_rows) == 2  # steps 5 and 10
    assert all(np.isfinite(r["eval_acc"]) for r in eval_rows)
