"""Pallas GRU kernel vs the jnp reference (SURVEY.md 4.3): interpret mode on
CPU must match gru_layer_recurrence / gru_forward closely in fp32, including
gradients through the custom VJP."""

import pytest

pytestmark = pytest.mark.slow

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molvax.kernels.gru import gru_forward_pallas, gru_layer_scan
from molvax.nn.gru import (
    gru_forward,
    gru_layer_recurrence,
    init_gru_params,
)

# bf16 matmuls inside the kernel vs fp32 reference: tolerance reflects the
# bf16 mantissa over a T-step recurrence.
ATOL = 5e-2
RTOL = 5e-2


def _layer(key, in_size, H):
    return init_gru_params(key, in_size, H, 1)[0]


@pytest.mark.parametrize("B,T,H", [(8, 12, 12), (16, 7, 130)])
def test_layer_scan_matches_reference(B, T, H):
    key = jax.random.key(0)
    layer = _layer(key, H, H)
    gi = jax.random.normal(jax.random.key(1), (T, B, 3 * H))
    h0 = jax.random.normal(jax.random.key(2), (B, H)) * 0.1

    h_seq_ref, h_final_ref = gru_layer_recurrence(layer, gi, h0)
    h_seq_k = gru_layer_scan(gi, layer["w_hh"], layer["b_hh"], h0)

    assert h_seq_k.shape == (T, B, H)
    np.testing.assert_allclose(
        np.asarray(h_seq_k), np.asarray(h_seq_ref), atol=ATOL, rtol=RTOL
    )
    np.testing.assert_allclose(
        np.asarray(h_seq_k[-1]), np.asarray(h_final_ref), atol=ATOL, rtol=RTOL
    )


def test_layer_scan_deep_interleave_fwd_and_grads(monkeypatch):
    """MOLVAX_GRU_CHAINS=8 at b_blk=128: all 8 chains must flow through both
    the forward and backward kernels (a dropped chain shows as zero/garbage
    rows; regression guard for the rotating-interleave schedule, which is
    off by default on this chip but kept for sweeps — see _pick_chains)."""
    monkeypatch.setenv("MOLVAX_GRU_CHAINS", "8")
    B, T, H = 128, 6, 20
    layer = _layer(jax.random.key(0), H, H)
    gi = jax.random.normal(jax.random.key(1), (T, B, 3 * H))
    h0 = jax.random.normal(jax.random.key(2), (B, H)) * 0.1

    h_seq_ref, _ = gru_layer_recurrence(layer, gi, h0)
    h_seq_k = gru_layer_scan(gi, layer["w_hh"], layer["b_hh"], h0)
    np.testing.assert_allclose(
        np.asarray(h_seq_k), np.asarray(h_seq_ref), atol=ATOL, rtol=RTOL
    )

    def loss_ref(gi, w, b, h0):
        h_seq, _ = gru_layer_recurrence({"w_hh": w, "b_hh": b}, gi, h0)
        return jnp.sum(jnp.sin(h_seq))

    def loss_k(gi, w, b, h0):
        return jnp.sum(jnp.sin(gru_layer_scan(gi, w, b, h0)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(gi, layer["w_hh"], layer["b_hh"], h0)
    g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3))(gi, layer["w_hh"], layer["b_hh"], h0)
    for name, a, b in zip(["dgi", "dw_hh", "db_hh", "dh0"], g_ref, g_k):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=ATOL, rtol=0.1, err_msg=name
        )


@pytest.mark.parametrize("B,T,I,H", [(16, 10, 9, 130), (8, 12, 12, 12)])
def test_layer_scan_x_matches_reference(B, T, I, H):
    """gru_layer_scan_x (in-kernel input GEMM) vs the jnp reference: values
    and all six gradients (x, w_ih, b_ih, w_hh, b_hh, h0)."""
    from molvax.kernels.gru import gru_layer_scan_x
    from molvax.nn.gru import init_gru_params

    layer = init_gru_params(jax.random.key(0), I, H, 1)[0]
    x = jax.random.normal(jax.random.key(1), (T, B, I))
    h0 = jax.random.normal(jax.random.key(2), (B, H)) * 0.1

    def ref(x, wih, bih, whh, bhh, h0):
        # bf16 matmul operands like the kernel, else gate trajectories
        # diverge enough to push a few weight-grad elements past rtol
        gi = (
            jnp.einsum(
                "tbi,ig->tbg",
                x.astype(jnp.bfloat16),
                wih.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            + bih
        )
        h_seq, _ = gru_layer_recurrence(
            {"w_hh": whh, "b_hh": bhh}, gi, h0, compute_dtype=jnp.bfloat16
        )
        return h_seq

    args = (x, layer["w_ih"], layer["b_ih"], layer["w_hh"], layer["b_hh"], h0)
    np.testing.assert_allclose(
        np.asarray(gru_layer_scan_x(*args)), np.asarray(ref(*args)),
        atol=ATOL, rtol=RTOL,
    )

    def loss_ref(*a):
        return jnp.sum(jnp.sin(ref(*a)))

    def loss_k(*a):
        return jnp.sum(jnp.sin(gru_layer_scan_x(*a)))

    g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    g_k = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
    for name, a, b in zip(["dx", "dw_ih", "db_ih", "dw_hh", "db_hh", "dh0"], g_ref, g_k):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=ATOL, rtol=0.1, err_msg=name
        )


def test_layer_scan_gradients_match():
    B, T, H = 8, 10, 12
    layer = _layer(jax.random.key(0), H, H)
    gi = jax.random.normal(jax.random.key(1), (T, B, 3 * H))
    h0 = jnp.zeros((B, H))

    def loss_ref(gi, w, b, h0):
        h_seq, _ = gru_layer_recurrence({"w_hh": w, "b_hh": b}, gi, h0)
        return jnp.sum(jnp.sin(h_seq))

    def loss_k(gi, w, b, h0):
        return jnp.sum(jnp.sin(gru_layer_scan(gi, w, b, h0)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(gi, layer["w_hh"], layer["b_hh"], h0)
    g_k = jax.grad(loss_k, argnums=(0, 1, 2, 3))(gi, layer["w_hh"], layer["b_hh"], h0)
    names = ["dgi", "dw_hh", "db_hh", "dh0"]
    for name, a, b in zip(names, g_ref, g_k):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=ATOL, rtol=0.1, err_msg=name
        )


def test_forward_pallas_matches_gru_forward():
    B, T, I, H, L = 8, 9, 10, 12, 3
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x_seq = jax.random.normal(jax.random.key(1), (B, T, I))

    out_ref, hf_ref = gru_forward(layers, x_seq)
    out_k, hf_k = gru_forward_pallas(layers, x_seq)
    assert out_k.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(hf_k), np.asarray(hf_ref), atol=ATOL, rtol=RTOL)


def test_forward_pallas_grads_match():
    B, T, I, H, L = 4, 6, 8, 12, 2
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x_seq = jax.random.normal(jax.random.key(1), (B, T, I))

    def loss(fwd, layers, x):
        out, _ = fwd(layers, x)
        return jnp.mean(out**2)

    g_ref = jax.grad(functools.partial(loss, gru_forward))(layers, x_seq)
    g_k = jax.grad(functools.partial(loss, gru_forward_pallas))(layers, x_seq)
    for (pa, pb) in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_k)):
        np.testing.assert_allclose(np.asarray(pb), np.asarray(pa), atol=ATOL, rtol=0.1)


def test_pallas_batch_ok_covers_reference_batches():
    """The reference config's batch 64 (and other 16-multiples) must run the
    kernel path instead of silently falling back to XLA (VERDICT r1 weak 2)."""
    from molvax.kernels.gru import _pick_b_blk, pallas_batch_ok

    for B in (16, 64, 96, 128, 160, 192, 256, 512, 2048):
        assert pallas_batch_ok(B), B
        blk = _pick_b_blk(B)
        assert B % blk == 0 and blk % 16 == 0 and blk <= 128, (B, blk)
    assert _pick_b_blk(128) == 128 and _pick_b_blk(256) == 128
    assert _pick_b_blk(64) == 64 and _pick_b_blk(96) == 96
    for B in (8, 24, 50):  # not decomposable into 16-row blocks
        assert not pallas_batch_ok(B), B


@pytest.mark.parametrize("B", [64, 96])
def test_layer_scan_nondefault_batches(B):
    """Numerics at the batch-64/96 block variants (interpret mode; the
    compiled path is covered by bench/tpu_validation on hardware)."""
    T, H = 6, 130
    layer = _layer(jax.random.key(0), H, H)
    gi = jax.random.normal(jax.random.key(1), (T, B, 3 * H))
    h0 = jax.random.normal(jax.random.key(2), (B, H)) * 0.1
    h_ref, _ = gru_layer_recurrence(layer, gi, h0)
    h_k = gru_layer_scan(gi, layer["w_hh"], layer["b_hh"], h0)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=ATOL, rtol=RTOL)


def test_jit_and_unaligned_h():
    """H=501 (the reference width) exercises the per-gate lane padding."""
    B, T, H = 4, 5, 501
    layer = _layer(jax.random.key(0), H, H)
    gi = jax.random.normal(jax.random.key(1), (T, B, 3 * H)) * 0.5
    h0 = jnp.zeros((B, H))
    h_ref, _ = gru_layer_recurrence(layer, gi, h0)
    h_k = jax.jit(gru_layer_scan)(gi, layer["w_hh"], layer["b_hh"], h0)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_ref), atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("B,T,I,H", [(16, 10, 9, 130), (8, 12, 12, 12)])
def test_layer_scan_x_strict_fp32_mode(B, T, I, H):
    """matmul_dtype='float32' (the dtype contract, VERDICT r4 next 4): the
    kernel must match the PURE-fp32 jnp reference to fp32 tolerance — two
    orders tighter than the bf16 gate — for values and all six gradients,
    proving no bf16 cast survives anywhere in fwd or bwd."""
    from molvax.kernels.gru import gru_layer_scan_x
    from molvax.nn.gru import init_gru_params

    layer = init_gru_params(jax.random.key(0), I, H, 1)[0]
    x = jax.random.normal(jax.random.key(1), (T, B, I))
    h0 = jax.random.normal(jax.random.key(2), (B, H)) * 0.1

    def ref(x, wih, bih, whh, bhh, h0):
        gi = (
            jnp.einsum("tbi,ig->tbg", x, wih, preferred_element_type=jnp.float32)
            + bih
        )
        h_seq, _ = gru_layer_recurrence({"w_hh": whh, "b_hh": bhh}, gi, h0)
        return h_seq

    def kern(*a):
        return gru_layer_scan_x(*a, matmul_dtype="float32")

    args = (x, layer["w_ih"], layer["b_ih"], layer["w_hh"], layer["b_hh"], h0)
    np.testing.assert_allclose(
        np.asarray(kern(*args)), np.asarray(ref(*args)), atol=1e-5, rtol=1e-5
    )

    g_ref = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))), argnums=tuple(range(6)))(*args)
    g_k = jax.grad(lambda *a: jnp.sum(jnp.sin(kern(*a))), argnums=tuple(range(6)))(*args)
    for name, a, b in zip(
        ["dx", "dw_ih", "db_ih", "dw_hh", "db_hh", "dh0"], g_ref, g_k
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_forward_pallas_honors_fp32_policy():
    """gru_forward_pallas(compute_dtype=float32) == the fp32 XLA stack to
    fp32 tolerance (the decoder-level contract)."""
    L, B, T, I, H = 2, 16, 8, 10, 20
    layers = init_gru_params(jax.random.key(3), I, H, L)
    x_seq = jax.random.normal(jax.random.key(4), (B, T, I))

    out_ref, hN_ref = gru_forward(layers, x_seq, compute_dtype=jnp.float32)
    out_k, hN_k = gru_forward_pallas(
        layers, x_seq, compute_dtype=jnp.float32, kernel="per_layer"
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_ref), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(hN_k), np.asarray(hN_ref), atol=1e-5, rtol=1e-5
    )


def test_fused_stack_pin_with_fp32_routes_per_layer(capsys):
    """A pinned kernel='fused_stack' under strict fp32 must not run the
    bf16-only stack: the dtype contract wins, with a one-time note."""
    import molvax.kernels.gru as gru_mod

    L, B, T, I, H = 2, 16, 8, 10, 20
    layers = init_gru_params(jax.random.key(5), I, H, L)
    x_seq = jax.random.normal(jax.random.key(6), (B, T, I))
    gru_mod._warned_fp32 = False
    out_k, _ = gru_forward_pallas(
        layers, x_seq, compute_dtype=jnp.float32, kernel="fused_stack"
    )
    out_ref, _ = gru_forward(layers, x_seq, compute_dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_ref), atol=1e-5, rtol=1e-5
    )
