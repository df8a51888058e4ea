import jax
import jax.numpy as jnp
import pytest

from molvax.utils import assert_finite, checked, debug_mode


def test_debug_mode_restores_flags():
    before = jax.config.jax_debug_nans
    with debug_mode(nans=True):
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_checked_passes_clean():
    def f(x):
        assert_finite({"x": x})
        return x + 1

    out = checked(f)(jnp.ones(4))
    assert float(out[0]) == 2.0


def test_checked_raises_on_nan():
    def f(x):
        assert_finite({"x": x}, "batch")
        return x

    with pytest.raises(Exception, match="non-finite"):
        checked(f)(jnp.array([1.0, float("nan")]))


def test_matmul_dtype_resolution():
    """compute_dtype contract: 'float32'/'bfloat16' are literal; 'auto'
    resolves by backend (fp32 on the CPU test backend)."""
    import jax.numpy as jnp

    from molvax.config import ModelConfig, chemvae_5k
    from molvax.utils import matmul_dtype

    assert matmul_dtype(ModelConfig(compute_dtype="float32")) == jnp.float32
    assert matmul_dtype(ModelConfig(compute_dtype="bfloat16")) == jnp.bfloat16
    # tests run on the CPU backend -> auto means fp32 here
    assert matmul_dtype(ModelConfig(compute_dtype="auto")) == jnp.float32
    assert chemvae_5k().model.compute_dtype == "auto"
    import pytest

    with pytest.raises(AssertionError):
        ModelConfig(compute_dtype="float16")
