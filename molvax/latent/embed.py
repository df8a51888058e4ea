"""Batch latent embedding: corpus -> latents and latents -> SMILES.

Beyond-reference workflow capability (SURVEY.md 2.10 scopes the reference's
latent tools to sample/interpolate/optimize): the original ChemVAE's most
common production use is as a *fixed featurizer* — encode a library to
latent vectors, run downstream ML / Bayesian optimization / clustering on
them externally, then decode candidate vectors back to molecules. The
reference lineage does this ad hoc in notebooks; here it is a first-class
API (`molvax encode` / `molvax decode`).

TPU-native shape discipline: work is chunked at a fixed batch size and the
last chunk is padded up, so every device call hits the same jitted
executable (no per-tail recompiles, static shapes throughout); results are
sliced back to the true length on host.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.charset import Charset, DEFAULT_CHARSET
from ..data.featurize import decode_codes, encode_smiles

Array = jax.Array


def _pad_rows(x: np.ndarray, batch: int) -> Tuple[np.ndarray, int]:
    """Pad axis 0 up to a multiple of ``batch`` by repeating row 0."""
    n = x.shape[0]
    rem = (-n) % batch
    if rem:
        x = np.concatenate([x, np.repeat(x[:1], rem, axis=0)], axis=0)
    return x, n


def encode_codes_chunked(
    params,
    cfg: ModelConfig,
    codes,
    batch: int = 512,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Chunked posterior encode with fixed-shape padding: every device call
    hits ONE jitted executable (the tail chunk pads up and slices back).
    Returns (mu, logvar) float32 of shape (N, latent_dim); empty input
    returns empty (0, L) arrays instead of a numpy concatenate error.

    The single shared helper behind `encode_corpus`,
    `sample.fit_aggregate_posterior`, and
    `evaluate.posterior_prior_metrics` (round-3 review finding: three
    divergent copies of the same chunk-and-pad loop)."""
    from ..nn.vae import encode as vae_encode

    codes = np.asarray(codes)
    if codes.shape[0] == 0:
        L = cfg.latent_dim
        return np.zeros((0, L), np.float32), np.zeros((0, L), np.float32)
    codes, n = _pad_rows(codes, batch)
    if mesh is not None:
        from ..parallel import batch_sharding, replicate
        from .sample import mesh_safe_cfg

        cfg = mesh_safe_cfg(cfg)
        if batch % mesh.shape["data"]:
            raise ValueError(
                f"batch {batch} not divisible by mesh data axis "
                f"{mesh.shape['data']}"
            )
        params = replicate(mesh, params)
        sh = batch_sharding(mesh)
        put = lambda c: jax.device_put(c, sh)  # noqa: E731
    else:
        put = jnp.asarray
    mus, logvars = [], []
    for lo in range(0, codes.shape[0], batch):
        mu, logvar = vae_encode(params, cfg, put(codes[lo : lo + batch]))
        mus.append(np.asarray(mu, np.float32))
        logvars.append(np.asarray(logvar, np.float32))
    return (
        np.concatenate(mus, axis=0)[:n],
        np.concatenate(logvars, axis=0)[:n],
    )


def encode_corpus(
    params,
    cfg: ModelConfig,
    smiles: List[str],
    charset: Charset = DEFAULT_CHARSET,
    batch: int = 256,
    mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Encode SMILES to posterior parameters.

    Returns ``(mu, logvar)`` as float32 ndarrays of shape (N, latent_dim).
    ``mu`` is the deterministic embedding downstream models should consume
    (the reparameterized sample adds decoder-facing noise only).
    ``mesh`` shards each chunk over the mesh's 'data' axis (GSPMD
    data-parallel encoding; ``batch`` must divide by it).
    """
    codes = encode_smiles(smiles, charset, cfg.max_len)
    return encode_codes_chunked(params, cfg, codes, batch=batch, mesh=mesh)


def decode_latents(
    params,
    cfg: ModelConfig,
    z,
    key: Optional[Array] = None,
    charset: Charset = DEFAULT_CHARSET,
    batch: int = 256,
    greedy: bool = True,
    temperature: float = 1.0,
    constrained: bool = False,
    beam: int = 1,
    mesh=None,
) -> List[str]:
    """Decode latent vectors (N, latent_dim) to SMILES strings.

    ``beam > 1`` returns the beam-search approximate-MAP string per latent
    (latent/beam.py); otherwise greedy or temperature sampling
    (latent/sample.py), optionally under the valence automaton
    (``constrained=True``: every output chemically valid by construction).
    ``mesh`` shards each chunk over the mesh's 'data' axis.
    """
    from .sample import generate

    z = np.asarray(z, np.float32)
    if z.ndim != 2 or z.shape[1] != cfg.latent_dim:
        raise ValueError(
            f"latents must be (N, {cfg.latent_dim}); got {z.shape}"
        )
    if key is None:
        key = jax.random.key(0)
    z, n = _pad_rows(z, batch)
    if mesh is not None:
        # replicate the params once, not per chunk
        from ..parallel import batch_sharding, replicate
        from .sample import mesh_safe_cfg

        cfg = mesh_safe_cfg(cfg)

        if batch % mesh.shape["data"]:
            raise ValueError(
                f"batch {batch} not divisible by mesh data axis "
                f"{mesh.shape['data']}"
            )
        params = replicate(mesh, params)
        z_sh = batch_sharding(mesh)
        put = lambda c: jax.device_put(c, z_sh)  # noqa: E731
    else:
        put = jnp.asarray
    out: List[str] = []
    for lo in range(0, z.shape[0], batch):
        zb = put(z[lo : lo + batch])
        key, kb = jax.random.split(key)
        if beam > 1:
            from .beam import beam_generate

            codes, _ = beam_generate(
                params, cfg, zb, beam=beam,
                constrained=constrained, charset=charset,
            )
        else:
            codes, _ = generate(
                params, cfg, zb, kb, greedy=greedy, temperature=temperature,
                constrained=constrained, charset=charset,
            )
        out.extend(decode_codes(codes, charset))
    return out[:n]
