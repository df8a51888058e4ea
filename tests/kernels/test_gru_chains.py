"""Chained scan_x kernels (MOLVAX_GRU_B_BLK / MOLVAX_GRU_CHAINS sweeps).

The chain count is read from the environment at trace time and is NOT part
of any jit cache key, so a chained configuration must run in its own
process — same pattern as the preemption test. The subprocess checks the
P=2 rotating-pipeline fwd AND bwd of `gru_layer_scan_x` against the jnp
reference at a block split (b_blk=32, R=16) that exercises cross-chain
interleaving and the per-chain dgi/dgh accumulation row order.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

SCRIPT = """
import os
import jax
jax.config.update("jax_platforms", "cpu")
_cc = os.environ.get("MOLVAX_TEST_COMPILE_CACHE")
if _cc:
    jax.config.update("jax_compilation_cache_dir", _cc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
import numpy as np
from molvax.kernels.gru import gru_layer_scan_x, _pick_b_blk, _pick_chains
from molvax.nn.gru import gru_layer_recurrence

B, T, I, H = 64, 10, 12, 130
assert _pick_b_blk(B) == 32 and _pick_chains(32) == 2, (
    _pick_b_blk(B), _pick_chains(32))
k = jax.random.key(0)
x = jax.random.normal(k, (T, B, I), jnp.float32) * 0.3
w_ih = jax.random.normal(jax.random.key(1), (I, 3 * H)) * 0.2
b_ih = jax.random.normal(jax.random.key(2), (3 * H,)) * 0.1
w_hh = jax.random.normal(jax.random.key(3), (H, 3 * H)) * 0.2
b_hh = jax.random.normal(jax.random.key(4), (3 * H,)) * 0.1
h0 = jax.random.normal(jax.random.key(5), (B, H)) * 0.2

def ref(x, w_ih, b_ih, w_hh, b_hh, h0):
    gi = jnp.einsum("tbi,ig->tbg", x.astype(jnp.bfloat16),
                    w_ih.astype(jnp.bfloat16)).astype(jnp.float32) + b_ih
    h_seq, _ = gru_layer_recurrence({"w_hh": w_hh, "b_hh": b_hh}, gi, h0)
    return h_seq

def loss(fn, *a):
    return jnp.mean(jnp.tanh(fn(*a)) ** 2)

out_k = gru_layer_scan_x(x, w_ih, b_ih, w_hh, b_hh, h0)
out_r = ref(x, w_ih, b_ih, w_hh, b_hh, h0)
np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                           atol=5e-2, rtol=5e-2)
g_k = jax.grad(lambda *a: loss(gru_layer_scan_x, *a), argnums=(0,1,2,3,4,5))(
    x, w_ih, b_ih, w_hh, b_hh, h0)
g_r = jax.grad(lambda *a: loss(ref, *a), argnums=(0,1,2,3,4,5))(
    x, w_ih, b_ih, w_hh, b_hh, h0)
for a, b in zip(g_k, g_r):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-2, rtol=1e-1)
print("CHAINS-OK")
"""


def test_chained_scan_x_matches_reference():
    env = dict(os.environ, MOLVAX_GRU_B_BLK="32", MOLVAX_GRU_CHAINS="2")
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0 and "CHAINS-OK" in r.stdout, (
        r.stdout[-500:], r.stderr[-2000:],
    )
