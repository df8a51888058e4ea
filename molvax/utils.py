"""Debug guards (SURVEY.md 5.2).

The reference is single-threaded Python, so race detection is moot; the
JAX-native hazards are NaNs from fp16-ish policies and tracer leaks. These
helpers wrap the idiomatic guards:

  * debug_mode(): context manager enabling jax_debug_nans (every primitive
    output NaN-checked, fails at the emitting op) and jax_check_tracer_leaks.
  * assert_finite(tree, name): chex-style in-jit finiteness check on a pytree
    (uses jax.debug so it works inside compiled code; dev builds only - it
    syncs, so never leave it in the hot path).
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_mode(nans: bool = True, tracer_leaks: bool = False):
    """with debug_mode(): train(...)  # fail fast at the first NaN."""
    prev_nans = jax.config.jax_debug_nans
    prev_leaks = jax.config.jax_check_tracer_leaks
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_check_tracer_leaks", tracer_leaks)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_check_tracer_leaks", prev_leaks)


def assert_finite(tree, name: str = "tree") -> None:
    """In-jit check that every leaf is finite (checkify.check under the
    hood: traced, raises on the host once errors propagate). Dev-only."""
    from jax.experimental import checkify

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        label = name + jax.tree_util.keystr(path)
        ok = jnp.all(jnp.isfinite(leaf))
        checkify.check(ok, f"non-finite values in {label}")


def enable_persistent_cache(path: str = "/tmp/molvax_jax_cache") -> bool:
    """Turn on JAX's on-disk compilation cache (best effort).

    Mosaic compiles of the deep-unrolled GRU kernels cost minutes through
    the remote PJRT tunnel and were being re-paid by every fresh process
    (bench, validation, CLI). The persistent cache keys on HLO + compile
    options, so repeat invocations skip straight to execution. Returns
    False when the backend/plugin rejects the cache (never fatal).

    CPU is deliberately excluded: XLA:CPU cache entries embed AOT machine
    code keyed on the *compiling* host's CPU features, so a cache written
    on one host poisons replay on another (observed as 'Unsupported element
    type for DotThunk' / SIGILL-risk warnings when /tmp survives a machine
    change). CPU compiles are fast; the cache only pays on TPU."""
    try:
        if jax.default_backend() == "cpu":
            return False
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return True
    except Exception:
        return False


def checked(fn):
    """Wrap a jittable fn so assert_finite/checkify.check failures raise:
    `loss, = molvax.utils.checked(step)(...)`."""
    from jax.experimental import checkify

    cf = checkify.checkify(fn)

    def wrapper(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def matmul_dtype(model_cfg):
    """Resolve ``ModelConfig.compute_dtype`` to the concrete matmul dtype
    (VERDICT r4 next 4, the dtype contract).

    'bfloat16' -> jnp.bfloat16 everywhere. 'float32' -> jnp.float32
    everywhere — including inside the Pallas GRU kernels (strict-fp32 mode)
    and by routing the bf16-only fused encoder/generation/stack kernels to
    their fp32-honoring XLA or per-layer twins. 'auto' -> bfloat16 on TPU,
    float32 elsewhere: the honest declaration of the platform-dependent
    policy the chemvae_5k preset runs (its benched TPU numbers are bf16;
    its CPU-runnable claim is fp32 — XLA CPU cannot execute bf16 dots).
    """
    import jax
    import jax.numpy as jnp

    cd = model_cfg.compute_dtype
    if cd == "auto":
        return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    return jnp.bfloat16 if cd == "bfloat16" else jnp.float32
