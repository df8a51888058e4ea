"""Valence-constrained decoding: an on-device SMILES-validity automaton.

Round-3 frontier (BASELINE.md "Chemistry-level quality"): a character VAE
trained offline tops out near 18-43% chemically valid prior samples. The
classic fix in the molecular-VAE literature is to constrain decoding so
only tokens that keep the string valid can be emitted (the Grammar VAE of
Kusner et al., PAPERS.md:8, masks by CFG production; this module goes
further and masks by *valence*, mirroring the acceptance rules of the
offline parser `data/smiles_check.py` exactly, so every generated string
is chemically valid by construction).

TPU-native design: the automaton is a pure-jnp state machine, vectorized
over the batch and stepped inside the generation `lax.scan`
(`latent/sample.py::generate(constrained=True)`). Per step it produces a
(B, C) boolean mask of legal next tokens; illegal logits are set to -inf
before argmax/categorical sampling. All state lives in fixed-shape int32
arrays (static shapes, no host round-trips), and the per-step cost
(~(B,10,10) ring bookkeeping + (B,C) table lookups) is negligible next to
the GRU step's matmuls.

State tracked per batch row (mirrors `smiles_check._parse`):
  * per-atom remaining bond budget (``val``, one slot per emitted atom;
    budgets are the parser's *most permissive* allowance:
    max(valence set) + 1 aromatic slack + |bracket charge| - bracket H);
  * per-atom tree parent (``par``): chain bonds are exactly (atom,
    parent) pairs, so the parser's duplicate-bond rule ('C1C1': a ring
    closure may not re-bond an already-bonded pair) is checkable without
    a full adjacency matrix;
  * current attachment atom ``prev``, pending bond order ``pend``;
  * branch stack (indices of atoms to return to at ')');
  * ring-closure digits: opening atom, bond-order hint, reserved order.
    Digits are REUSABLE after they close (canonical SMILES reuses digit 1
    constantly, e.g. 'c1ccccc1Cc1ccccc1'); closed ring bonds move to a
    fixed pair pool (``ppa``/``ppb``/``pn``, capacity max_len//2 — each
    closure consumes two digit tokens, so the pool cannot overflow)
    against which new closures are duplicate-checked;
  * two-char halogen fixup: 'C'+'l' retroactively becomes chlorine
    (budget 4 -> 1), 'B'+'r' bromine — exactly the parser's tokenizer;
  * a bracket-atom sub-machine covering ``[sym]``, ``[nH]``, ``[C@@H]``,
    ``[N+]``-style atoms (symbol, @/@@, H-count, charge);
  * ``fresh`` ('(' seen, no atom yet): while set, '(' / ')' / ring digits
    / '.' are illegal — a branch must start with an atom or bond (the
    parser's OpenSMILES branch-start rule, so 'C((C)C)' never decodes);
  * ``done`` (pad emitted -> only pad may follow, so padding is always a
    suffix and the decoded string is exactly the prefix).

Termination guarantees (the string must *end* valid at T=120):
  * a length budget ``need`` — a proven upper bound on the tokens required
    to close every open branch/ring/bond/bracket — gates every token so
    that ``need_after <= tokens_remaining``. The ring term credits
    closures that are directly possible from the attachment atom
    (duplicate-bond- and budget-aware) and costs 2 (enabling atom +
    digit) for the rest; when EVERY uncredited ring's partner is the
    attachment atom itself, one extra enabling atom is budgeted
    (``att_extra``) because the first chain atom is adjacent to the
    partner and the duplicate-bond rule bars it from closing;
  * an anti-starvation invariant: no token may leave the row with an open
    ring while the attachment atom has zero bond budget and no stacked
    ancestor has any — the state from which no closure chain exists.

Together these make the legal-token set provably non-empty at every step
(a pad escape hatch exists for defense in depth; `advance` records it in
``esc`` and the test suite asserts it never fires).

The automaton's legal set is a *superset* of real-corpus transitions: for
every chemically valid training string, each teacher token is legal under
the mask (property-tested over the molgen corpus and hand-written
ZINC-style SMILES in tests/unit/test_constrain.py), so constraining never
fights the data distribution — it only removes mass the parser would
reject anyway.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.charset import Charset

Array = jax.Array


def _iota(shape, dim) -> Array:
    """broadcasted_iota: the only iota form Mosaic accepts, and identical to
    the jnp.arange broadcasts it replaces under XLA. Every index helper in
    this module routes through it so step_mask/advance can run verbatim
    inside the Pallas automaton kernel (kernels/automaton.py)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


DMAX = 16  # max branch nesting depth
NRING = 10  # ring-digit slots (digits 1..9 in slot 1..9; slot 0 unused)
RMAX = 6  # max simultaneously open rings during constrained generation
BIG = 99  # sentinel "not closable" ring cost

# Most-permissive bond budgets consistent with smiles_check._VALENCE:
# max(allowed valences), +1 for aromatic slack (see smiles_check module doc).
_BUDGET = {
    "B": 3, "C": 4, "N": 5, "O": 2, "P": 5, "S": 6, "F": 1, "I": 1,
    "c": 5, "n": 6, "o": 3, "s": 7, "b": 4, "p": 6,
}
_BOND = {"-": 1, "=": 2, "#": 3, "/": 1, "\\": 1, ":": 1, "$": 4}


@dataclasses.dataclass(frozen=True)
class Tables:
    """Static per-charset token-attribute tables (jnp, device-resident)."""

    n: int
    atom_budget: Array  # (C,) int32: bond budget, -1 if not an atom token
    is_atom: Array  # (C,) bool
    bond_order: Array  # (C,) int32: 0 if not a bond token
    digit_val: Array  # (C,) int32: 1..9 for ring digits, 0 otherwise
    is_l: Array  # (C,) bool: 'l' (Cl continuation)
    is_r: Array  # (C,) bool: 'r' (Br continuation)
    is_c_upper: Array  # (C,) bool: 'C' (chlorine prefix)
    is_b_upper: Array  # (C,) bool: 'B' (bromine prefix)
    is_open: Array  # '('
    is_close: Array  # ')'
    is_dot: Array  # '.'
    is_lbr: Array  # '['
    is_rbr: Array  # ']'
    is_at: Array  # '@'
    is_h: Array  # 'H'
    is_plus: Array  # '+'
    is_minus: Array  # '-'
    is_pad: Array  # pad (index 0)


class ConState(NamedTuple):
    """Vectorized automaton state (one row per batch element)."""

    val: Array  # (B, A) int32 remaining bond budget per atom slot
    par: Array  # (B, A) int32 tree parent per atom slot (-1 root)
    n_atoms: Array  # (B,) int32
    prev: Array  # (B,) int32 attachment atom index, -1 none
    pend: Array  # (B,) int32 pending bond order, 0 none
    stack: Array  # (B, DMAX) int32 saved attachment atoms
    sp: Array  # (B,) int32 stack depth
    fresh: Array  # (B,) bool '(' seen, no atom yet (branch-start rules)
    rpart: Array  # (B, NRING) int32 ring-opening atom, -1 closed/unused
    rhint: Array  # (B, NRING) int32 bond-order hint at open (0 none)
    rres: Array  # (B, NRING) int32 order reserved at open (hint or 1)
    ppa: Array  # (B, P) int32 closed ring-bond pair lo atom (-1 unused)
    ppb: Array  # (B, P) int32 closed ring-bond pair hi atom (-1 unused)
    pn: Array  # (B,) int32 number of pool entries written
    done: Array  # (B,) bool pad emitted
    esc: Array  # (B,) bool escape hatch fired (must stay False)
    hfix: Array  # (B,) int32 halogen fixup: 0 none, 1 fresh 'C', 2 fresh 'B'
    horder: Array  # (B,) int32 attach order consumed by the fixup atom
    b: Array  # (B,) int32 bracket sub-state 0..8
    bbud: Array  # (B,) int32 bracket symbol budget
    bh: Array  # (B,) int32 bracket H count
    bchg: Array  # (B,) int32 bracket |charge|
    bsign: Array  # (B,) int32 bracket charge sign (0 unset)
    bsymc: Array  # (B,) bool bracket symbol was 'C' ('l' may follow)
    bsymb: Array  # (B,) bool bracket symbol was 'B' ('r' may follow)


@functools.lru_cache(maxsize=8)
def build_tables(charset: Charset) -> Tables:
    chars = charset.chars
    n = len(chars)
    if "C" not in chars:
        raise ValueError("constrained decoding needs 'C' in the charset")
    with jax.ensure_compile_time_eval():
        return _build_tables_eager(chars, n)


def _build_tables_eager(chars, n) -> Tables:

    def flag(pred):
        return jnp.asarray(np.array([pred(c) for c in chars], bool))

    budget = np.full(n, -1, np.int32)
    for i, c in enumerate(chars):
        if c in _BUDGET:
            budget[i] = _BUDGET[c]
    bond = np.array([_BOND.get(c, 0) for c in chars], np.int32)
    digit = np.array(
        [int(c) if c.isdigit() and c != "0" else 0 for c in chars], np.int32
    )
    return Tables(
        n=n,
        atom_budget=jnp.asarray(budget),
        is_atom=jnp.asarray(budget >= 0),
        bond_order=jnp.asarray(bond),
        digit_val=jnp.asarray(digit),
        is_l=flag(lambda c: c == "l"),
        is_r=flag(lambda c: c == "r"),
        is_c_upper=flag(lambda c: c == "C"),
        is_b_upper=flag(lambda c: c == "B"),
        is_open=flag(lambda c: c == "("),
        is_close=flag(lambda c: c == ")"),
        is_dot=flag(lambda c: c == "."),
        is_lbr=flag(lambda c: c == "["),
        is_rbr=flag(lambda c: c == "]"),
        is_at=flag(lambda c: c == "@"),
        is_h=flag(lambda c: c == "H"),
        is_plus=flag(lambda c: c == "+"),
        is_minus=flag(lambda c: c == "-"),
        is_pad=flag(lambda c: c == " "),
    )


def init_state(batch: int, max_atoms: int) -> ConState:
    z = lambda *s: jnp.zeros(s if s else (batch,), jnp.int32)  # noqa: E731
    f = lambda *s: jnp.zeros(s if s else (batch,), bool)  # noqa: E731
    neg = lambda *s: jnp.full(s if s else (batch,), -1, jnp.int32)  # noqa: E731
    # each ring closure consumes two digit tokens, so max_atoms//2 pool
    # entries can never overflow within a max_atoms-token sequence
    npair = max(1, max_atoms // 2)
    return ConState(
        val=z(batch, max_atoms), par=neg(batch, max_atoms),
        n_atoms=z(), prev=neg(), pend=z(),
        stack=neg(batch, DMAX), sp=z(), fresh=f(),
        rpart=neg(batch, NRING), rhint=z(batch, NRING), rres=z(batch, NRING),
        ppa=neg(batch, npair), ppb=neg(batch, npair), pn=z(),
        done=f(), esc=f(), hfix=z(), horder=z(),
        b=z(), bbud=z(), bh=z(), bchg=z(), bsign=z(), bsymc=f(), bsymb=f(),
    )


def _gather_val(val: Array, idx: Array) -> Array:
    """val[i, idx[i]] with idx == -1 -> 0. One-hot masked reduction rather
    than a gather: TPU gathers on tiny tensors serialize on the scalar
    unit, while the (B, A) compare+select+sum vectorizes on the VPU."""
    oh = _iota((idx.shape[0], val.shape[1]), 1) == idx[:, None]
    return jnp.sum(jnp.where(oh, val, 0), axis=1)


def _anc_spare_max(
    val: Array,
    stack: Array,
    sp: Array,
    drop_top: bool = False,
    adj_idx: Array = None,
    adj: Array = 0,
    adj_idx2: Array = None,
    adj2: Array = 0,
):
    """Max remaining budget over stacked ancestor atoms (0 if none).

    ``adj_idx``/``adj`` subtract a candidate token's valence consumption
    from stacked copies of that atom, so the result reflects the POST-token
    state — essential when ``prev`` is itself on the stack (right after
    '(' the pushed atom IS the attachment atom, and spending its last unit
    must zero the ancestor-spare view too)."""
    depth = _iota((1, DMAX), 1)
    limit = (sp - 1 if drop_top else sp)[:, None]
    live = depth < limit
    oh = stack[:, :, None] == _iota((1, 1, val.shape[1]), 2)
    vals = jnp.sum(jnp.where(oh, val[:, None, :], 0), axis=2)
    if adj_idx is not None:
        vals = vals - jnp.where(stack == adj_idx[:, None], adj[:, None], 0)
    if adj_idx2 is not None:
        vals = vals - jnp.where(stack == adj_idx2[:, None], adj2[:, None], 0)
    return jnp.max(jnp.where(live & (stack >= 0), vals, 0), axis=1)


def _dup_wrt(st: ConState, a: Array) -> Array:
    """(B, NRING) bool: closing a ring at atom ``a`` against each slot's
    partner would put a second bond on an already-bonded pair — either a
    closed ring bond (the pair pool) or the chain bond between ``a`` and
    its tree parent / the partner and *its* parent (the parser's 'C1C1'
    duplicate-bond rule). Rows for closed slots are garbage; callers mask
    with ``open_d``."""
    part = st.rpart  # (B, D)
    lo = jnp.minimum(part, a[:, None])
    hi = jnp.maximum(part, a[:, None])
    pool = jnp.any(
        (st.ppa[:, None, :] == lo[:, :, None])
        & (st.ppb[:, None, :] == hi[:, :, None]),
        axis=2,
    )  # (B, D)
    par_a = _gather_val(st.par, a)  # (B,) parent of a
    oh = part[:, :, None] == _iota((1, 1, st.par.shape[1]), 2)
    par_part = jnp.sum(jnp.where(oh, st.par[:, None, :], 0), axis=2)  # (B, D)
    chain = (part == par_a[:, None]) | (par_part == a[:, None])
    return pool | chain


def _hist(mask: Array, res: Array) -> Array:
    """(..., NRING) eligibility mask + per-slot costs res in {1..4} ->
    (..., 4) count-per-cost histogram. Bond orders are bounded by 4
    ('$'), so greedy cheapest-first credit needs no sort. One broadcast
    compare+sum (no jnp.stack: concatenation on the minor dim is a Mosaic
    relayout; the compare form fuses)."""
    cv = _iota((1,) * res.ndim + (4,), res.ndim) + 1  # costs 1..4
    # fold the mask into res BEFORE the minor-dim insertion: res >= 1 always,
    # so masked-off slots (res -> 0) never match a cost in 1..4. Mosaic
    # rejects minor-dim insertion on i1 vectors ("only supported for 32-bit
    # types"), so the [..., None] must happen on the int32 operand only.
    resm = jnp.where(mask, res, 0)
    eq = resm[..., None] == cv
    return jnp.sum(eq.astype(jnp.int32), axis=-2)


def _take(h: Array, w: Array) -> Array:
    """Greedy max #closures affordable within budget ``w`` given cost
    histogram ``h`` (..., 4): take all cost-1 closures first, then cost-2,
    ... — exactly the sorted-cumulative-cost prefix the old implementation
    computed with jnp.sort + cumsum (replaced: 5 sorts per decode step were
    the constrained path's wall on TPU)."""
    m = jnp.zeros_like(w)
    for i, c in enumerate((1, 2, 3, 4)):
        t = jnp.clip(w // c, 0, h[..., i])
        m = m + t
        w = w - t * c
    return m


def _credit(h: Array, ndir: Array, v: Array, r: Array, partial_only=False):
    """Closures achievable from budget ``v`` given the eligible-ring cost
    histogram ``h`` (..., 4). Reserves 1 budget unit for the enabling
    atom unless every open ring closes directly."""
    k = jnp.minimum(_take(h, v - 1), ndir)
    if not partial_only:
        kfull = _take(h, v)
        full_ok = (ndir >= r) & (kfull >= r)
        k = jnp.where(full_ok, r, k)
    return jnp.minimum(k, r)


def step_mask(tb: Tables, st: ConState, t: Array, max_len: int) -> Array:
    """(B, C) bool mask of legal next tokens."""
    return step_mask_rem(tb, st, max_len - t - 1)


def step_mask_rem(tb: Tables, st: ConState, rem: Array) -> Array:
    """(B, C) bool mask of legal next tokens; ``rem`` = tokens remaining
    AFTER this one. Pure jnp on Mosaic-safe ops: this exact function is the
    body of the Pallas automaton kernel (kernels/automaton.py) AND the XLA
    fallback path — single source of truth."""
    B = st.prev.shape[0]
    prev_ok = st.prev >= 0
    vprev = _gather_val(st.val, st.prev)
    anc = _anc_spare_max(st.val, st.stack, st.sp)
    open_d = st.rpart >= 0  # (B, NRING)
    r = jnp.sum(open_d, axis=1)
    o_att = jnp.where(st.pend > 0, st.pend, jnp.where(prev_ok, 1, 0))
    outside = (st.b == 0) & ~st.done

    # --- ring-closure credit machinery -----------------------------------
    res = jnp.maximum(st.rres, 1)
    dup_prev = _dup_wrt(st, st.prev)
    # two open rings sharing a partner cannot both close at one atom (the
    # second closure would duplicate the ring bond): only the first slot
    # per distinct partner counts as directly closable
    same_p = open_d[:, None, :] & (st.rpart[:, :, None] == st.rpart[:, None, :])
    # strictly-lower-triangular (tril k=-1): row index > column index
    lower = _iota((1, NRING, NRING), 1) > _iota((1, NRING, NRING), 2)
    first_p = ~jnp.any(same_p & lower, axis=2)  # (B, NRING)
    direct_prev = open_d & (st.rpart != st.prev[:, None]) & ~dup_prev
    cred_prev = direct_prev & first_p  # credit view only; NOT legality
    h_prev = _hist(cred_prev, res)
    ndir_prev = jnp.sum(cred_prev, axis=1)
    # from a NEW atom every partner-distinct open ring is direct (fresh
    # index: never in a closed pair) — EXCEPT rings whose partner is the
    # atom the new atom attaches to: that ring bond would duplicate the
    # new chain bond (parser 'C1C1' rule)
    new_ok = open_d & first_p & (st.rpart != st.prev[:, None])
    h_new = _hist(new_ok, res)
    ndir_new = jnp.sum(new_ok, axis=1)
    # open rings whose partner IS the current attachment atom: the first
    # enabling atom of the uncredited cost-2 closure chain attaches to
    # prev and is therefore barred from closing them (duplicate-bond
    # rule); when ALL uncredited rings are such, one extra enabling atom
    # is needed (att_extra below)
    n_att = jnp.sum(open_d & (st.rpart == st.prev[:, None]), axis=1)

    def need_ok(k, sp=None, rr=None, extra=0):
        need = (st.sp if sp is None else sp) + 2 * (r if rr is None else rr) - k
        return (need + extra) <= rem

    def att_extra(k, rr, natt):
        # credit never covers partner==attachment slots, so k <= rr - natt;
        # equality means every uncredited ring needs the one-removed chain
        return ((natt > 0) & (k >= rr - natt)).astype(jnp.int32)

    # --- atom tokens (outside brackets) ----------------------------------
    g = tb.atom_budget[None, :]  # (1, C)
    v_new = g - o_att[:, None]  # (B, C)
    anc_att = _anc_spare_max(
        st.val, st.stack, st.sp, adj_idx=st.prev, adj=o_att
    )
    t_ok = ~((r[:, None] > 0) & (v_new == 0) & (anc_att[:, None] == 0))
    k_atom = _credit(h_new[:, None, :], ndir_new[:, None], v_new, r[:, None])
    ok_atom = (
        tb.is_atom[None, :] & outside[:, None]
        & (~prev_ok | (vprev >= o_att))[:, None]
        & (v_new >= 0) & t_ok
        & need_ok(k_atom, sp=st.sp[:, None], rr=r[:, None])
    )

    # --- 'l'/'r' halogen continuations (outside brackets) ----------------
    v_hal = 1 - st.horder
    t_hal = ~((r > 0) & (v_hal == 0) & (anc == 0))
    k_hal = _credit(h_prev, ndir_prev, v_hal, r)
    ok_hal_row = outside & (v_hal >= 0) & t_hal & need_ok(k_hal)
    ok_l = tb.is_l[None, :] & (ok_hal_row & (st.hfix == 1))[:, None]
    ok_r = tb.is_r[None, :] & (ok_hal_row & (st.hfix == 2))[:, None]

    # --- bond tokens ------------------------------------------------------
    freshx = st.fresh.astype(jnp.int32)
    ok_bond_row = (
        outside & prev_ok & (st.pend == 0)
        & need_ok(jnp.zeros_like(r), extra=1 + freshx)
    )
    ok_bond = (
        (tb.bond_order[None, :] > 0)
        & ok_bond_row[:, None]
        & (vprev[:, None] >= tb.bond_order[None, :])
    )

    # --- ring digits ------------------------------------------------------
    # a closed slot's digit is reusable (rpart == -1 suffices); digits are
    # illegal while fresh (a branch cannot start with a ring digit)
    can_open = st.rpart == -1  # (B, NRING)
    v_po = (vprev - o_att)[:, None]
    k_po = _credit(h_prev[:, None, :], ndir_prev[:, None],
                   jnp.broadcast_to(v_po, (B, NRING)), r[:, None],
                   partial_only=True)
    ok_open_slot = (
        outside[:, None] & prev_ok[:, None] & can_open & ~st.fresh[:, None]
        & (vprev >= o_att)[:, None] & (r < RMAX)[:, None]
        & ((v_po >= 1) | (anc_att[:, None] >= 1))
        & need_ok(k_po, sp=st.sp[:, None], rr=(r + 1)[:, None],
                  extra=att_extra(k_po, (r + 1)[:, None],
                                  (n_att + 1)[:, None]))
    )

    hint = st.rhint
    o_fin = jnp.where(st.pend[:, None] > 0, st.pend[:, None],
                      jnp.maximum(hint, 1))
    mismatch = (st.pend[:, None] > 0) & (hint > 0) & (st.pend[:, None] != hint)
    sur = o_fin - jnp.maximum(st.rres, 1)
    oh_part = st.rpart[:, :, None] == _iota((1, 1, st.val.shape[1]), 2)
    vpart = jnp.sum(
        jnp.where(oh_part, st.val[:, None, :], 0), axis=2
    )  # (B, NRING): val at each slot's partner atom (0 when closed)
    eligible = direct_prev  # open, partner != prev, no duplicate pair
    v_pc = vprev[:, None] - o_fin  # (B, NRING)
    # ancestor spare after closing each digit j: shared stack-value lookup,
    # per-digit adjustments applied in one broadcast (was a vmap of
    # _anc_spare_max — NRING redundant stack gathers per step)
    stk_oh = st.stack[:, :, None] == _iota((1, 1, st.val.shape[1]), 2)
    stk_vals = jnp.sum(
        jnp.where(stk_oh, st.val[:, None, :], 0), axis=2
    )  # (B, DMAX)
    live_anc = (_iota((1, DMAX), 1) < st.sp[:, None]) & (st.stack >= 0)
    vals_j = (
        stk_vals[:, None, :]
        - jnp.where(
            st.stack[:, None, :] == st.prev[:, None, None],
            o_fin[:, :, None], 0,
        )
        - jnp.where(
            st.stack[:, None, :] == st.rpart[:, :, None],
            sur[:, :, None], 0,
        )
    )  # (B, NRING, DMAX)
    anc_pc = jnp.max(
        jnp.where(live_anc[:, None, :], vals_j, 0), axis=2
    )  # (B, NRING)
    t_pc = ~(((r - 1)[:, None] > 0) & (v_pc == 0) & (anc_pc == 0))
    # per-digit exclusion: drop slot j and same-partner slots from credit
    same_part = st.rpart[:, :, None] == st.rpart[:, None, :]  # (B, j, m)
    direct_mat = direct_prev[:, None, :] & ~same_part & first_p[:, None, :]
    h_mat = _hist(direct_mat, res[:, None, :])
    ndir_mat = jnp.sum(direct_mat, axis=2)
    k_pc = _credit(h_mat, ndir_mat, v_pc, (r - 1)[:, None])
    ok_close_slot = (
        outside[:, None] & prev_ok[:, None] & eligible & ~mismatch
        & (vprev[:, None] >= o_fin) & (vpart >= sur) & t_pc
        & ~st.fresh[:, None]
        & need_ok(k_pc, sp=st.sp[:, None], rr=(r - 1)[:, None],
                  extra=att_extra(k_pc, (r - 1)[:, None], n_att[:, None]))
    )
    slot_ok = ok_open_slot | ok_close_slot  # (B, NRING)
    dig = tb.digit_val  # (C,) values 0..9
    # token -> slot selection as a static (NRING, C) one-hot contraction
    # (dig > 0 excludes non-digit tokens; slot 0 is never a digit's slot)
    dig_sel = (_iota((NRING, tb.n), 0) == dig[None, :]) & (dig[None, :] > 0)
    # minor-dim insertion on the int32 copy (Mosaic rejects it on i1)
    ok_digit = (
        jnp.sum(
            slot_ok.astype(jnp.int32)[:, :, None]
            * dig_sel.astype(jnp.int32)[None, :, :],
            axis=1,
        )
        > 0
    )

    # --- '(' / ')' / '.' --------------------------------------------------
    k_cur = _credit(h_prev, ndir_prev, vprev, r)
    # a branch cannot start with another branch (parser branch-start rule)
    ok_open_br = (
        outside & prev_ok & ~st.fresh
        & (st.pend == 0) & (st.sp < DMAX) & (vprev >= 1)
        & need_ok(k_cur, sp=st.sp + 1, extra=1)
    )[:, None] & tb.is_open[None, :]

    popped = _gather_val(
        st.stack, jnp.where(st.sp > 0, st.sp - 1, 0)
    )  # atom index at top of stack
    vpop = _gather_val(st.val, jnp.where(st.sp > 0, popped, -1))
    anc2 = _anc_spare_max(st.val, st.stack, st.sp, drop_top=True)
    dup_pop = _dup_wrt(st, popped)
    direct_pop = open_d & (st.rpart != popped[:, None]) & ~dup_pop & first_p
    k_pop = _credit(_hist(direct_pop, res), jnp.sum(direct_pop, axis=1), vpop, r)
    n_att_pop = jnp.sum(open_d & (st.rpart == popped[:, None]), axis=1)
    ok_close_br = (
        outside & (st.sp > 0) & (st.pend == 0) & ~st.fresh
        & ~((r > 0) & (vpop == 0) & (anc2 == 0))
        & need_ok(k_pop, sp=st.sp - 1, extra=att_extra(k_pop, r, n_att_pop))
    )[:, None] & tb.is_close[None, :]

    ok_dot = (
        outside & prev_ok & (st.pend == 0) & (st.sp == 0) & (r == 0)
        # a chain must follow the dot (parser 'trailing dot' rule): the
        # next token must be an atom, so one slot must remain after it
        & (rem >= 1)
    )[:, None] & tb.is_dot[None, :]

    # --- bracket atoms ----------------------------------------------------
    ok_lbr = (
        outside & (~prev_ok | (vprev >= o_att))
        & need_ok(k_cur, extra=2)
    )[:, None] & tb.is_lbr[None, :]

    inb = (st.b > 0) & ~st.done
    # while a ring is open with no ancestor spare, the bracket atom must
    # keep >= 1 budget after attaching (anti-starvation, see module doc)
    extra_v = ((r > 0) & (anc_att == 0)).astype(jnp.int32)
    o_req = o_att + extra_v
    bud_eff = st.bbud + st.bchg - st.bh
    # length budgets: every in-bracket token must leave room for ']' plus
    # the branch/ring closures pending outside the bracket (the credit is
    # computed from the future bracket atom's remaining budget)
    v_brk = bud_eff - o_att  # (B,)
    k_brk = _credit(h_new, ndir_new, v_brk, r)
    fit_rbr = need_ok(k_brk)  # ']' now
    fit_deco = need_ok(k_brk, extra=1)  # one decoration token + ']'
    ok_sym = (
        tb.is_atom[None, :] & (inb & (st.b == 1))[:, None]
        & (g >= o_req[:, None])
        & need_ok(k_atom, sp=st.sp[:, None], rr=r[:, None], extra=1)
    )
    # budget-reducing decorations gate on their POST-decoration credit so
    # ']' stays feasible at the next step
    k_lr = _credit(h_new, ndir_new, 1 - o_att, r)
    fit_lr = need_ok(k_lr, extra=1)
    ok_bl = tb.is_l[None, :] & (
        inb & (st.b == 2) & st.bsymc & (1 >= o_req) & fit_lr
    )[:, None]
    ok_br_ = tb.is_r[None, :] & (
        inb & (st.b == 2) & st.bsymb & (1 >= o_req) & fit_lr
    )[:, None]
    ok_at = tb.is_at[None, :] & (
        inb & ((st.b == 2) | (st.b == 3)) & fit_deco
    )[:, None]
    k_h = _credit(h_new, ndir_new, bud_eff - 1 - o_att, r)
    ok_bh = tb.is_h[None, :] & (
        inb & (st.b >= 2) & (st.b <= 4) & (bud_eff - 1 >= o_req)
        & need_ok(k_h, extra=1)
    )[:, None]
    sign_new = inb & (st.b >= 2) & (st.b <= 6)
    sign_more = inb & (st.b == 7) & (st.bchg < 3)
    ok_plus = tb.is_plus[None, :] & (
        (sign_new | (sign_more & (st.bsign > 0))) & fit_deco
    )[:, None]
    ok_minus = tb.is_minus[None, :] & (
        (sign_new | (sign_more & (st.bsign < 0))) & fit_deco
    )[:, None]
    v_hd = st.bbud[:, None] + st.bchg[:, None] - dig[None, :] - o_att[:, None]
    k_hd = _credit(h_new[:, None, :], ndir_new[:, None], v_hd, r[:, None])
    ok_bdig_h = (dig[None, :] > 0) & (
        inb & (st.b == 5)
    )[:, None] & (v_hd >= extra_v[:, None]) & need_ok(
        k_hd, sp=st.sp[:, None], rr=r[:, None], extra=1
    )
    # charge digit: only after exactly one sign char ([N+2] yes, [N++2] no
    # - the parser's charge grammar is sign-run OR sign+digits, not both)
    ok_bdig_c = (dig[None, :] > 0) & (dig[None, :] <= 3) & (
        inb & (st.b == 7) & (st.bchg == 1) & fit_deco
    )[:, None]
    ok_rbr = tb.is_rbr[None, :] & (
        inb & (st.b >= 2) & (bud_eff >= o_req) & fit_rbr
    )[:, None]

    # --- pad --------------------------------------------------------------
    closed = (
        (st.n_atoms >= 1) & (st.pend == 0) & (st.sp == 0) & (r == 0)
        & (st.b == 0) & prev_ok  # prev == -1 here means a trailing dot
    )
    ok_pad = (st.done | closed)[:, None] & tb.is_pad[None, :]

    mask = (
        ok_atom | ok_l | ok_r | ok_bond | ok_digit | ok_open_br
        | ok_close_br | ok_dot | ok_lbr | ok_sym | ok_bl | ok_br_ | ok_at
        | ok_bh | ok_plus | ok_minus | ok_bdig_h | ok_bdig_c | ok_rbr
        | ok_pad
    )
    # done rows: only pad. Written as i1 logic, not jnp.where: Mosaic lowers
    # a bool-valued vector select through an i8 round-trip and rejects the
    # i8->i1 truncation ("Unsupported target bitwidth for truncation").
    d = st.done[:, None]
    mask = (d & tb.is_pad[None, :]) | (~d & mask)
    # defense in depth: if a row has no legal token (unreachable by the
    # invariants above), open the pad escape hatch; advance() records it.
    any_ok = jnp.any(mask, axis=1)
    return mask | (~any_ok[:, None] & tb.is_pad[None, :])


def advance(tb: Tables, st: ConState, tok: Array) -> ConState:
    """Apply one emitted token (B,) to the automaton state.

    Mosaic-safe (see step_mask_rem): per-token table attributes come from
    one one-hot contraction instead of (B,)-indexed gathers — TPU gathers
    on tiny tensors serialize on the scalar unit, and Mosaic has no
    vector-gather at all."""
    B, A = st.val.shape
    oht = _iota((B, tb.n), 1) == tok[:, None]  # (B, C) emitted-token one-hot

    def pick_i(table):  # (C,) int32 -> (B,)
        return jnp.sum(jnp.where(oht, table[None, :], 0), axis=1)

    def pick_b(table):  # (C,) bool -> (B,)
        return jnp.any(oht & table[None, :], axis=1)

    g_tok = pick_i(tb.atom_budget)  # (B,)
    is_atom = pick_b(tb.is_atom)
    bond_o = pick_i(tb.bond_order)
    dig = pick_i(tb.digit_val)
    t_l, t_r = pick_b(tb.is_l), pick_b(tb.is_r)
    t_cu, t_bu = pick_b(tb.is_c_upper), pick_b(tb.is_b_upper)
    t_open, t_close = pick_b(tb.is_open), pick_b(tb.is_close)
    t_dot, t_lbr, t_rbr = pick_b(tb.is_dot), pick_b(tb.is_lbr), pick_b(tb.is_rbr)
    t_at, t_h = pick_b(tb.is_at), pick_b(tb.is_h)
    t_plus, t_minus = pick_b(tb.is_plus), pick_b(tb.is_minus)
    is_pad = pick_b(tb.is_pad)
    outside = (st.b == 0) & ~st.done
    prev_ok = st.prev >= 0
    o_att = jnp.where(st.pend > 0, st.pend, jnp.where(prev_ok, 1, 0))

    oh_prev = (_iota((1, A), 1) == st.prev[:, None]) & prev_ok[:, None]
    oh_new = _iota((1, A), 1) == st.n_atoms[:, None]

    # --- atom emission (outside bracket) ---------------------------------
    do_atom = outside & is_atom
    val = st.val - jnp.where(do_atom, o_att, 0)[:, None] * oh_prev
    val = val + jnp.where(do_atom, g_tok - o_att, 0)[:, None] * oh_new
    # tree parent: the chain bond this atom creates (root atoms stay -1)
    par = jnp.where(
        (do_atom & prev_ok)[:, None] & oh_new, st.prev[:, None], st.par
    )
    n_atoms = st.n_atoms + do_atom.astype(jnp.int32)
    prev = jnp.where(do_atom, st.n_atoms, st.prev)
    pend = jnp.where(do_atom, 0, st.pend)
    fresh = st.fresh & ~do_atom  # i1 logic: Mosaic rejects bool selects
    hfix = jnp.where(
        do_atom & t_cu, 1,
        jnp.where(do_atom & t_bu, 2, 0),
    )
    horder = jnp.where(do_atom, o_att, 0)

    # --- halogen fixup ('l'/'r' outside bracket) -------------------------
    do_hal = outside & (t_l | t_r) & (st.hfix > 0)
    # the fixup atom is prev (the fresh C/B): budget becomes 1 - horder
    oh_prev2 = _iota((1, A), 1) == prev[:, None]
    oh_cur = _iota((1, A), 1) == jnp.clip(prev, 0, A - 1)[:, None]
    cur_pv = jnp.sum(jnp.where(oh_cur, val, 0), axis=1)
    val = val + jnp.where(do_hal, (1 - st.horder) - cur_pv, 0)[:, None] * oh_prev2

    # --- bond -------------------------------------------------------------
    do_bond = outside & (bond_o > 0) & ~do_hal
    pend = jnp.where(do_bond, bond_o, pend)

    # --- ring digit -------------------------------------------------------
    do_dig = outside & (dig > 0)
    slot = jnp.where(do_dig, dig, 0)  # (B,) slot index (0 inert)
    oh_slot = (_iota((1, NRING), 1) == slot[:, None]) & do_dig[:, None]
    oh_sl = _iota((1, NRING), 1) == slot[:, None]  # exact one-hot
    slot_part = jnp.sum(jnp.where(oh_sl, st.rpart, 0), axis=1)
    is_close = do_dig & (slot_part >= 0)
    is_openr = do_dig & ~is_close
    # open
    res_o = jnp.maximum(st.pend, 1)
    rpart = jnp.where(oh_slot & is_openr[:, None], st.prev[:, None], st.rpart)
    rhint = jnp.where(oh_slot & is_openr[:, None], st.pend[:, None], st.rhint)
    rres = jnp.where(oh_slot & is_openr[:, None], res_o[:, None], st.rres)
    val = val - jnp.where(is_openr, res_o, 0)[:, None] * oh_prev
    # close
    slot_hint = jnp.sum(jnp.where(oh_sl, st.rhint, 0), axis=1)
    slot_res = jnp.maximum(jnp.sum(jnp.where(oh_sl, st.rres, 0), axis=1), 1)
    o_fin = jnp.where(st.pend > 0, st.pend, jnp.maximum(slot_hint, 1))
    sur = o_fin - slot_res
    val = val - jnp.where(is_close, o_fin, 0)[:, None] * oh_prev
    oh_part = _iota((1, A), 1) == slot_part[:, None]
    val = val - jnp.where(is_close, sur, 0)[:, None] * oh_part
    # append the closed pair to the pool (duplicate-bond bookkeeping) and
    # free the slot — its digit is reusable, as in canonical SMILES
    lo = jnp.minimum(st.prev, slot_part)
    hi = jnp.maximum(st.prev, slot_part)
    oh_pn = _iota((1, st.ppa.shape[1]), 1) == st.pn[:, None]
    wr_pool = oh_pn & is_close[:, None]
    ppa = jnp.where(wr_pool, lo[:, None], st.ppa)
    ppb = jnp.where(wr_pool, hi[:, None], st.ppb)
    pn = st.pn + is_close.astype(jnp.int32)
    rpart = jnp.where(oh_slot & is_close[:, None], -1, rpart)
    pend = jnp.where(do_dig, 0, pend)

    # --- '(' / ')' / '.' --------------------------------------------------
    do_open = outside & t_open
    oh_sp = _iota((1, DMAX), 1) == st.sp[:, None]
    stack = jnp.where(
        oh_sp & do_open[:, None], st.prev[:, None], st.stack
    )
    sp = st.sp + do_open.astype(jnp.int32)
    fresh = fresh | do_open

    do_close = outside & t_close
    oh_top = _iota((1, DMAX), 1) == jnp.clip(st.sp - 1, 0, DMAX - 1)[:, None]
    top = jnp.sum(jnp.where(oh_top, st.stack, 0), axis=1)
    prev = jnp.where(do_close, top, prev)
    sp = jnp.where(do_close, st.sp - 1, sp)
    fresh = fresh & ~do_close

    do_dot = outside & t_dot
    prev = jnp.where(do_dot, -1, prev)

    # --- bracket machine --------------------------------------------------
    do_lbr = outside & t_lbr
    b = jnp.where(do_lbr, 1, st.b)
    inb = (st.b > 0) & ~st.done
    # symbol
    do_sym = inb & (st.b == 1) & is_atom
    b = jnp.where(do_sym, 2, b)
    bbud = jnp.where(do_sym, g_tok, st.bbud)
    bsymc = (do_sym & t_cu) | (~do_sym & st.bsymc)
    bsymb = (do_sym & t_bu) | (~do_sym & st.bsymb)
    # Cl/Br inside bracket
    do_bhal = inb & (st.b == 2) & (
        (t_l & st.bsymc) | (t_r & st.bsymb)
    )
    bbud = jnp.where(do_bhal, 1, bbud)
    bsymc = bsymc & ~do_bhal
    bsymb = bsymb & ~do_bhal
    # chirality
    do_at = inb & t_at
    b = jnp.where(do_at & (st.b == 2), 3, jnp.where(do_at & (st.b == 3), 4, b))
    # H count
    do_bh = inb & t_h
    b = jnp.where(do_bh, 5, b)
    bh = jnp.where(do_bh, 1, st.bh)
    do_bhd = inb & (st.b == 5) & (dig > 0)
    b = jnp.where(do_bhd, 6, b)
    bh = jnp.where(do_bhd, dig, bh)
    # charge
    do_sign = inb & (t_plus | t_minus)
    new_sign = jnp.where(t_plus, 1, -1)
    first_sign = do_sign & (st.b != 7)
    more_sign = do_sign & (st.b == 7)
    b = jnp.where(do_sign, 7, b)
    bchg = jnp.where(first_sign, 1, st.bchg + more_sign.astype(jnp.int32))
    bsign = jnp.where(first_sign, new_sign, st.bsign)
    do_bcd = inb & (st.b == 7) & (dig > 0)
    b = jnp.where(do_bcd, 8, b)
    bchg = jnp.where(do_bcd, dig, bchg)
    # close bracket -> emit atom
    do_rbr = inb & t_rbr & (st.b >= 2)
    bud_eff = jnp.maximum(st.bbud + st.bchg - st.bh, 0)
    val = val - jnp.where(do_rbr, o_att, 0)[:, None] * oh_prev
    val = val + jnp.where(do_rbr, bud_eff - o_att, 0)[:, None] * oh_new
    par = jnp.where(
        (do_rbr & (st.prev >= 0))[:, None] & oh_new, st.prev[:, None], par
    )
    n_atoms = n_atoms + do_rbr.astype(jnp.int32)
    prev = jnp.where(do_rbr, st.n_atoms, prev)
    pend = jnp.where(do_rbr, 0, pend)
    fresh = fresh & ~do_rbr
    b = jnp.where(do_rbr, 0, b)
    bh = jnp.where(do_rbr, 0, bh)
    bchg = jnp.where(do_rbr, 0, bchg)
    bsign = jnp.where(do_rbr, 0, bsign)
    bbud = jnp.where(do_rbr, 0, bbud)

    # --- pad / done -------------------------------------------------------
    closed = (
        (st.n_atoms >= 1) & (st.pend == 0) & (st.sp == 0)
        & (jnp.sum(st.rpart >= 0, axis=1) == 0) & (st.b == 0)
        & (st.prev >= 0)  # trailing dot leaves prev == -1
    )
    esc = st.esc | (is_pad & ~st.done & ~closed)
    done = st.done | is_pad

    # halogen fixup window closes after any non-'C'/'B'-atom token
    hfix = jnp.where(do_atom, hfix, 0)
    horder = jnp.where(do_atom, horder, 0)

    return ConState(
        val=val, par=par, n_atoms=n_atoms, prev=prev, pend=pend,
        stack=stack, sp=sp, fresh=fresh, rpart=rpart, rhint=rhint,
        rres=rres, ppa=ppa, ppb=ppb, pn=pn,
        done=done, esc=esc, hfix=hfix, horder=horder,
        b=b, bbud=bbud, bh=bh, bchg=bchg, bsign=bsign, bsymc=bsymc,
        bsymb=bsymb,
    )


@functools.partial(jax.jit, static_argnames=("charset", "max_len"))
def validate_codes(
    codes: Array, charset: Charset, max_len: int
) -> Tuple[Array, Array]:
    """Run the automaton over teacher token sequences.

    Returns (allowed (B, T) bool — token t was legal under the mask given
    the prefix; closed (B,) bool — final state accepts padding). Used by
    the test suite to prove the mask is a superset of real-corpus
    transitions (any chem-valid string must thread the automaton)."""
    tb = build_tables(charset)
    B, T = codes.shape

    def step(st, inp):
        t, tok = inp
        m = step_mask(tb, st, t, max_len)
        ok = jnp.take_along_axis(m, tok[:, None], axis=1)[:, 0]
        return advance(tb, st, tok), ok

    st0 = init_state(B, max_len)
    stf, oks = jax.lax.scan(
        step, st0, (jnp.arange(T), jnp.swapaxes(codes, 0, 1))
    )
    closed = (
        (stf.n_atoms >= 1) & (stf.pend == 0) & (stf.sp == 0)
        & (jnp.sum(stf.rpart >= 0, axis=1) == 0) & (stf.b == 0)
        & (stf.prev >= 0)  # trailing dot leaves prev == -1
    ) | stf.done
    return jnp.swapaxes(oks, 0, 1), closed & ~stf.esc
