"""On-hardware validation battery for the Pallas kernels (run manually on a
TPU host; the pytest suite runs on CPU where kernels fall back, so compiled
numerics are validated here - SURVEY.md 4.3 'on-TPU, tolerance match').

`python -m bench.tpu_validation`  (~3 min incl. compiles)

Checks:
  1. fused train step (conv+sampler+GRU kernels) trains: loss falls, finite
  2. GRU kernel forward vs fp32 XLA scan: max |err| within bf16 tolerance
  3. fused encoder vs jnp reference: tolerance match
  4. fused sampler: exact KL, correct eps statistics, key determinism
  5. generation kernel vs fp32 scan on trained weights: >=99% greedy agreement
  6. throughput: pallas vs XLA path (reported, not asserted - tunnel noise)
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print("SKIP: requires a TPU backend", file=sys.stderr)
        return 1

    from molvax.config import zinc250k
    from molvax.data import DEFAULT_CHARSET, synthetic_dataset
    from molvax.data.featurize import one_hot
    from molvax.kernels.conv_enc import fused_encode
    from molvax.kernels.gru import gru_forward_pallas
    from molvax.kernels.sampler import fused_sample_kl
    from molvax.latent.sample import generate
    from molvax.nn import vae
    from molvax.nn.encoder import encode as ref_encode
    from molvax.nn.gru import gru_forward
    from molvax.parallel import make_mesh, replicate, shard_batch
    from molvax.train import init_state, make_train_step
    from molvax.train.loss import gaussian_kl

    results = {}
    cfg = zinc250k()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, charset_size=DEFAULT_CHARSET.size),
        train=dataclasses.replace(cfg.train, batch_size=256),
    )
    ds = synthetic_dataset(4096, max_len=120, seed=0)
    mesh = make_mesh(devices=jax.devices()[:1])
    b = shard_batch(mesh, ds.codes[:256])

    # 1. fused train step trains
    state = replicate(mesh, init_state(cfg))
    step = make_train_step(cfg)
    state, m = step(state, b, None)
    l0 = float(np.asarray(m["loss"]))
    for _ in range(30):
        state, m = step(state, b, None)
    l1 = float(np.asarray(m["loss"]))
    results["train_step"] = {"loss0": round(l0, 2), "loss30": round(l1, 2)}
    assert np.isfinite(l1) and l1 < l0, results["train_step"]

    params = jax.device_get(state.params)
    mcfg = cfg.model

    # 2. GRU kernel vs fp32 scan
    x_seq = jax.random.normal(jax.random.key(1), (256, 120, 329))
    o_ref, _ = jax.jit(gru_forward)(params["decoder"]["gru"], x_seq)
    o_k, _ = jax.jit(gru_forward_pallas)(params["decoder"]["gru"], x_seq)
    err = float(jnp.max(jnp.abs(o_ref - o_k)))
    results["gru_kernel_max_err"] = round(err, 5)
    assert err < 0.05, err

    # 3. fused encoder vs reference
    codes = jnp.asarray(ds.codes[:256])
    mu_k, lv_k = fused_encode(params["encoder"], mcfg, codes)
    mu_r, lv_r = ref_encode(params["encoder"], mcfg, one_hot(codes, mcfg.charset_size))
    err = float(jnp.max(jnp.abs(mu_k - mu_r)))
    results["conv_kernel_max_err"] = round(err, 5)
    assert err < 0.05, err

    # 4. sampler: exact KL, stats, determinism
    z, kl = fused_sample_kl(jax.random.key(1), mu_r, lv_r, 1.0)
    kl_err = float(jnp.max(jnp.abs(kl - gaussian_kl(mu_r, lv_r))))
    eps = (z - mu_r) / jnp.exp(0.5 * lv_r)
    z2, _ = fused_sample_kl(jax.random.key(1), mu_r, lv_r, 1.0)
    results["sampler"] = {
        "kl_err": round(kl_err, 7),
        "eps_mean": round(float(eps.mean()), 3),
        "eps_std": round(float(eps.std()), 3),
        "deterministic": bool(jnp.array_equal(z, z2)),
    }
    assert kl_err < 1e-4 and abs(float(eps.mean())) < 0.05
    assert abs(float(eps.std()) - 1.0) < 0.05 and bool(jnp.array_equal(z, z2))

    # 5. generation kernel agreement on trained weights
    mu_t, _ = vae.encode(params, mcfg, codes)
    cfg_gen = dataclasses.replace(mcfg, use_pallas_generation=True)
    cfg_ref = dataclasses.replace(mcfg, use_pallas=False)
    c_ref, _ = generate(params, cfg_ref, mu_t, jax.random.key(2), greedy=True)
    c_k, _ = generate(params, cfg_gen, mu_t, jax.random.key(2), greedy=True)
    agree = float(np.mean(np.asarray(c_ref) == np.asarray(c_k)))
    results["generation_agreement"] = round(agree, 4)
    assert agree > 0.98, agree

    # 6. throughput comparison (informational)
    def rate(use_pallas):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(mcfg, use_pallas=use_pallas)
        )
        s = replicate(mesh, init_state(c))
        f = make_train_step(c)
        s, mm = f(s, b, None)
        float(np.asarray(mm["loss"]))
        rs = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(15):
                s, mm = f(s, b, None)
            float(np.asarray(mm["loss"]))
            rs.append(15 * 256 / (time.perf_counter() - t0))
        return float(np.median(rs[1:]))

    results["smiles_per_sec"] = {
        "xla": round(rate(False)),
        "pallas": round(rate(True)),
    }

    print(json.dumps(results, indent=2))
    print("ALL TPU VALIDATIONS PASSED", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
