"""On-hardware validation battery for the Pallas kernels.

The pytest suite runs on CPU where kernels run in interpret mode (and the
hardware-PRNG paths fall back), so *compiled* Mosaic numerics are validated
here - SURVEY.md 4.3 'on-TPU, tolerance match'. Two entry points:

  * ``python -m bench.tpu_validation``: full battery (~3 min incl. compiles).
  * ``quick_gate(params, cfg, codes)``: the fast subset (GRU/conv/sampler
    max-err + generation agreement) that ``bench.py`` runs on every benchmark
    invocation, asserting thresholds - a Mosaic numerics regression fails the
    bench instead of shipping silently past the CPU suite (VERDICT r1 weak 3).
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from typing import Dict

import numpy as np


def quick_gate(params, mcfg, codes) -> Dict[str, float]:
    """Compiled-kernel numerics vs jnp references on trained weights.

    params: trained VAE params pytree; mcfg: ModelConfig (pallas-enabled);
    codes: (B, T) uint8 batch, B a supported kernel batch. Raises
    AssertionError on tolerance violation; returns the measured errors.
    """
    import jax
    import jax.numpy as jnp

    from molvax.data.featurize import one_hot
    from molvax.kernels.conv_enc import fused_encode
    from molvax.kernels.gru import gru_forward_pallas
    from molvax.kernels.sampler import fused_sample_kl
    from molvax.latent.sample import generate
    from molvax.nn import vae
    from molvax.nn.encoder import encode as ref_encode
    from molvax.nn.gru import gru_forward
    from molvax.train.loss import gaussian_kl

    out: Dict[str, float] = {}
    B = codes.shape[0]
    gru_in = params["decoder"]["gru"][0]["w_ih"].shape[0]

    # GRU recurrence kernel vs fp32 XLA scan
    x_seq = jax.random.normal(jax.random.key(1), (B, mcfg.max_len, gru_in))
    o_ref, _ = jax.jit(gru_forward)(params["decoder"]["gru"], x_seq)
    o_k, _ = jax.jit(gru_forward_pallas)(params["decoder"]["gru"], x_seq)
    out["gru_max_err"] = float(jnp.max(jnp.abs(o_ref - o_k)))
    assert out["gru_max_err"] < 0.05, f"GRU kernel numerics: {out}"

    # fused conv encoder vs jnp reference
    codes_j = jnp.asarray(codes)
    mu_k, lv_k = fused_encode(params["encoder"], mcfg, codes_j)
    mu_r, lv_r = ref_encode(
        params["encoder"], mcfg, one_hot(codes_j, mcfg.charset_size)
    )
    out["conv_max_err"] = float(jnp.max(jnp.abs(mu_k - mu_r)))
    assert out["conv_max_err"] < 0.05, f"conv kernel numerics: {out}"

    # fused sampler: exact KL, unit-Gaussian eps, key determinism
    z, kl = fused_sample_kl(jax.random.key(1), mu_r, lv_r, 1.0)
    out["sampler_kl_err"] = float(jnp.max(jnp.abs(kl - gaussian_kl(mu_r, lv_r))))
    eps = (z - mu_r) / jnp.exp(0.5 * lv_r)
    z2, _ = fused_sample_kl(jax.random.key(1), mu_r, lv_r, 1.0)
    out["sampler_eps_mean"] = float(eps.mean())
    out["sampler_eps_std"] = float(eps.std())
    assert out["sampler_kl_err"] < 1e-4, f"sampler KL: {out}"
    assert abs(out["sampler_eps_mean"]) < 0.05, f"sampler eps mean: {out}"
    assert abs(out["sampler_eps_std"] - 1.0) < 0.05, f"sampler eps std: {out}"
    assert bool(jnp.array_equal(z, z2)), "sampler not key-deterministic"

    # generation kernel vs fp32 scan (greedy agreement on these weights)
    mu_t, _ = vae.encode(params, mcfg, codes_j)
    cfg_gen = dataclasses.replace(mcfg, use_pallas_generation=True)
    cfg_ref = dataclasses.replace(mcfg, use_pallas=False)
    c_ref, _ = generate(params, cfg_ref, mu_t, jax.random.key(2), greedy=True)
    c_k, _ = generate(params, cfg_gen, mu_t, jax.random.key(2), greedy=True)
    out["gen_agreement"] = float(np.mean(np.asarray(c_ref) == np.asarray(c_k)))
    assert out["gen_agreement"] > 0.97, f"generation kernel agreement: {out}"
    return out


def main() -> int:
    import jax
    import numpy as np

    if jax.default_backend() != "tpu":
        print("SKIP: requires a TPU backend", file=sys.stderr)
        return 1

    from molvax.config import zinc250k
    from molvax.data import DEFAULT_CHARSET, synthetic_dataset
    from molvax.parallel import make_mesh, replicate, shard_batch
    from molvax.train import init_state, make_train_step

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

    # 2-5. kernel numerics gate on the trained weights
    params = jax.device_get(state.params)
    results.update(
        {k: round(v, 5) for k, v in quick_gate(params, cfg.model, ds.codes[:256]).items()}
    )

    # 6. throughput comparison (informational)
    def rate(use_pallas):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, use_pallas=use_pallas)
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
