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
