"""Wavefront stacked-GRU kernel vs the jnp reference (SURVEY.md 4.3).

Interpret mode on CPU: forward values and every gradient through the custom
VJP must match molvax.nn.gru.gru_forward. Shapes are chosen so the planner's
block decomposition is actually exercised (single-block AND multi-block with
cross-block carries + hbound residuals)."""

import pytest

pytestmark = pytest.mark.slow

import functools

import jax
import jax.numpy as jnp
import numpy as np

from molvax.kernels.gru_stack import (
    _plan_blocks,
    gru_forward_wavefront,
    gru_stack_scan,
    stack_plan_ok,
)
from molvax.nn.gru import gru_forward, init_gru_params

ATOL = 5e-2
RTOL = 5e-2


@pytest.mark.parametrize(
    "B,T,I,H,L",
    [
        (16, 12, 10, 130, 3),  # single time block (K=12)
        (16, 14, 9, 130, 2),  # K=2 -> 7 blocks: cross-block carries + hbound
        (32, 10, 8, 501, 3),  # reference width: per-gate lane padding
        # P=2 chain interleave (128 rows) is covered by
        # test_wavefront_grads_match[128-4], whose forward pass runs this
        # same kernel — a second 128-row interpret-mode sweep here cost 68 s
        # for no extra coverage (round-4 suite budget)
    ],
)
def test_wavefront_matches_reference(B, T, I, H, L):
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x_seq = jax.random.normal(jax.random.key(1), (B, T, I))
    assert stack_plan_ok(layers, B, T)

    out_ref, hf_ref = gru_forward(layers, x_seq)
    out_k, hf_k = gru_forward_wavefront(layers, x_seq)
    assert out_k.shape == out_ref.shape and hf_k.shape == hf_ref.shape
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(hf_k), np.asarray(hf_ref), atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize(
    "B,T",
    [
        (16, 12),  # single-block plan, P=1
        (16, 14),  # multi-block plan (K=2, 7 blocks)
        (64, 4),  # reference-config block: b_blk=64, P=2 (32-row chains)
        (128, 4),  # P=2 chain interleave (64-row chains) through fwd AND bwd
    ],
)
def test_wavefront_grads_match(B, T):
    I, H, L = 10, 130, 3
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x_seq = jax.random.normal(jax.random.key(1), (B, T, I))

    def loss(fwd, layers, x):
        out, h_final = fwd(layers, x)
        # touch BOTH outputs so the dh_final cotangent path is exercised
        return jnp.mean(out**2) + jnp.sum(jnp.sin(h_final))

    # bf16 matmul operands in the reference, like the kernel — else gate
    # trajectories diverge enough at B=128 to push a few weight-grad
    # elements past rtol (same alignment as test_gru_kernel's scan_x test)
    ref_fwd = functools.partial(gru_forward, compute_dtype=jnp.bfloat16)
    g_ref = jax.grad(functools.partial(loss, ref_fwd))(layers, x_seq)
    g_k = jax.grad(functools.partial(loss, gru_forward_wavefront))(layers, x_seq)
    flat_ref, tdef = jax.tree.flatten(g_ref)
    flat_k, _ = jax.tree.flatten(g_k)
    # Every leaf here is a weight/bias grad (grad is w.r.t. the layers
    # pytree only), and each sums one bf16-rounded dgi/dgh cotangent per
    # (t, b) sample (the kernel casts cotangents to bf16 exactly as the
    # residual stream always did; the jnp reference keeps them fp32), so
    # absolute drift grows ~sqrt(B*T) — scale atol with the contraction
    # length (192 = the smallest parametrized case).
    atol_w = ATOL * max(1.0, (B * T / 192) ** 0.5 * 1.9)
    for path, a, b in zip(jax.tree.leaves_with_path(g_ref), flat_ref, flat_k):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=atol_w, rtol=0.1,
            err_msg=str(path[0]),
        )


def test_wavefront_h0_and_x0_grads():
    """Direct gru_stack_scan call: gradients w.r.t. x0, the layer-0 input
    weights (in-kernel since round 4), and a nonzero h0."""
    B, T, I, H, L = 16, 12, 9, 130, 2
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x0 = jax.random.normal(jax.random.key(1), (T, B, I)) * 0.5
    h0 = jax.random.normal(jax.random.key(2), (L, B, H)) * 0.1
    wih0, bih0 = layers[0]["w_ih"], layers[0]["b_ih"]
    wih = jnp.stack([l["w_ih"] for l in layers[1:]])
    bih = jnp.stack([l["b_ih"] for l in layers[1:]])
    whh = jnp.stack([l["w_hh"] for l in layers])
    bhh = jnp.stack([l["b_hh"] for l in layers])

    def ref(x0, wih0, bih0, wih, bih, whh, bhh, h0):
        # bf16 matmul operands like the kernel (same alignment as the
        # scan_x test) — else gate trajectories diverge enough to push a
        # few weight/bias-grad elements past rtol
        from molvax.nn.gru import gru_layer_recurrence

        bf = jnp.bfloat16
        dot = lambda a, spec, b: jnp.einsum(
            spec, a.astype(bf), b.astype(bf),
            preferred_element_type=jnp.float32,
        )
        gi = dot(x0, "tbi,ig->tbg", wih0) + bih0
        h_seq, _ = gru_layer_recurrence(
            {"w_hh": whh[0], "b_hh": bhh[0]}, gi, h0[0], compute_dtype=bf
        )
        for li in range(1, L):
            gi = dot(h_seq, "tbh,hg->tbg", wih[li - 1]) + bih[li - 1]
            h_seq, _ = gru_layer_recurrence(
                {"w_hh": whh[li], "b_hh": bhh[li]}, gi, h0[li], compute_dtype=bf
            )
        return h_seq

    def loss_ref(*args):
        return jnp.sum(jnp.sin(ref(*args)))

    def loss_k(*args):
        out, _ = gru_stack_scan(*args)
        return jnp.sum(jnp.sin(out))

    args = (x0, wih0, bih0, wih, bih, whh, bhh, h0)
    out_k, _ = gru_stack_scan(*args)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(ref(*args)), atol=ATOL, rtol=RTOL,
    )
    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    g_k = jax.grad(loss_k, argnums=tuple(range(8)))(*args)
    names = ["dx0", "dwih0", "dbih0", "dwih", "dbih", "dwhh", "dbhh", "dh0"]
    for name, a, b in zip(names, g_ref, g_k):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=ATOL, rtol=0.1, err_msg=name
        )


def test_faithful_twin_tracks_kernel_tightly():
    """gru_forward_faithful mirrors the kernel's rounding points exactly, so
    in interpret mode (same accumulation semantics) they must agree to float
    noise — this is what lets the on-TPU gate keep a tight tolerance."""
    from molvax.kernels.gru_stack import gru_forward_faithful

    B, T, I, H, L = 16, 14, 9, 130, 2
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x_seq = jax.random.normal(jax.random.key(1), (B, T, I))
    out_f, hf_f = gru_forward_faithful(layers, x_seq)
    out_k, hf_k = gru_forward_wavefront(layers, x_seq)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_f), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hf_k), np.asarray(hf_f), atol=2e-5, rtol=1e-5)


def test_plan_blocks_budget():
    """Planner facts: the production shapes get a plan; L=1 and undecomposable
    batches are rejected; the plan respects T divisibility."""
    # reference decoder: H=501 -> Hp=512, L=3, T=120
    plan = _plan_blocks(120, 3, 512, 256)
    assert plan is not None
    b_blk, K, P = plan
    assert 120 % K == 0 and 256 % b_blk == 0
    # P=2 (>=32-row chains) is the measured round-4 default; deep
    # interleaves lost on 16-row VPU tiles (see _plan_blocks docstring)
    assert P == 2 and (b_blk // P) % 16 == 0
    # batch 64 (reference config) must plan too
    assert _plan_blocks(120, 3, 512, 64) is not None
    # undecomposable batch -> no plan
    assert _plan_blocks(120, 3, 512, 50) is None
    # moses_scaled's 4xGRU-1024 working set (~167 MB) exceeds the budget,
    # so 'auto' falls back to the per-layer kernel there (measured the
    # right call: per-layer 8.8k vs the old stack's ~3.7k at that shape)
    assert _plan_blocks(120, 4, 1024, 256, 640) is None
    layers1 = init_gru_params(jax.random.key(0), 16, 16, 1)
    assert not stack_plan_ok(layers1, 16, 12)


@pytest.mark.parametrize("kernel", ["auto", "per_layer", "fused_stack"])
def test_forward_pallas_kernel_selection(kernel):
    """gru_forward_pallas must produce equivalent results whichever kernel
    the config selects (routing is internal; numerics are the contract)."""
    from molvax.kernels.gru import gru_forward_pallas

    B, T, I, H, L = 16, 12, 10, 130, 3
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x_seq = jax.random.normal(jax.random.key(1), (B, T, I))
    out_ref, hf_ref = gru_forward(layers, x_seq)
    out_k, hf_k = gru_forward_pallas(layers, x_seq, kernel=kernel)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref), atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(hf_k), np.asarray(hf_ref), atol=ATOL, rtol=RTOL)


def test_grads_match_across_batch_blocks(monkeypatch):
    """nB=2 grid: the v3 backward's VMEM dW/db accumulators zero only at
    program_id (0,0) and must accumulate across BOTH batch blocks — the
    production flagship shape (B=256, b_blk=128) runs this path, but every
    natural test batch plans to a single block, so force a 16-row block."""
    monkeypatch.setenv("MOLVAX_GRU_B_BLK", "16")
    B, T, I, H, L = 32, 4, 9, 130, 2
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x_seq = jax.random.normal(jax.random.key(1), (B, T, I))
    from molvax.kernels.gru_stack import _plan_blocks as pb

    b_blk, K, P = pb(T, L, 130 + 126, B)  # Hp=256
    assert B // b_blk == 2, "env override must split the batch into 2 blocks"

    def loss(fwd, layers, x):
        out, h_final = fwd(layers, x)
        return jnp.mean(out**2) + jnp.sum(jnp.sin(h_final))

    ref_fwd = functools.partial(gru_forward, compute_dtype=jnp.bfloat16)
    g_ref = jax.grad(functools.partial(loss, ref_fwd))(layers, x_seq)
    g_k = jax.grad(functools.partial(loss, gru_forward_wavefront))(layers, x_seq)
    for path, a, b in zip(
        jax.tree.leaves_with_path(g_ref),
        jax.tree.leaves(g_ref),
        jax.tree.leaves(g_k),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=ATOL, rtol=0.1,
            err_msg=str(path[0]),
        )


def test_auto_routing_predicate(monkeypatch):
    """auto -> fused_stack on hardware at every batch (stack_plan_ok still
    gates oversize shapes in the caller); explicit selection always
    honored; interpret mode (tests/dryruns) keeps per-layer."""
    from molvax.kernels import gru as gru_mod

    monkeypatch.setattr(gru_mod, "_interpret", lambda: False)
    assert gru_mod._route_stack("auto")
    assert gru_mod._route_stack("fused_stack")
    assert not gru_mod._route_stack("per_layer")
    monkeypatch.setattr(gru_mod, "_interpret", lambda: True)
    assert not gru_mod._route_stack("auto")
    assert gru_mod._route_stack("fused_stack")


def test_faithful_twin_none_mode_tracks_per_layer():
    """round_gi='none' mirrors gru_layer_scan_x's rounding points (gi fp32
    in-kernel, never stored) — tight agreement in interpret mode."""
    from molvax.kernels.gru import gru_forward_pallas
    from molvax.kernels.gru_stack import gru_forward_faithful

    B, T, I, H, L = 16, 14, 9, 130, 2
    layers = init_gru_params(jax.random.key(0), I, H, L)
    x_seq = jax.random.normal(jax.random.key(1), (B, T, I))
    out_f, hf_f = gru_forward_faithful(layers, x_seq, round_gi="none")
    out_k, hf_k = gru_forward_pallas(layers, x_seq, kernel="per_layer")
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_f), atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(hf_k), np.asarray(hf_f), atol=2e-5, rtol=1e-5)
