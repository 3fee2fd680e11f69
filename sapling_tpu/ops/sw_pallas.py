"""Fused Pallas TPU kernel for the batched affine-gap Smith-Waterman pass.

Same semantics as ops.sw.sw_pass (the TPU-first replacement for the
reference's striped SSE2 kernels, src/ssw.c:192-380,406-580), but as ONE
Pallas kernel: the XLA `lax.scan` in ops.sw round-trips the [B, W] H/E
state through HBM every reference column, while here the whole DP state
(H, E, best-column snapshot, per-column maxima) lives in VMEM for the
duration of the sweep — the only HBM traffic is the input blocks and the
8-field result row.

Layout follows docs/PERFORMANCE.md ("batch axis LAST"): each grid step
owns a [W, BB] tile (query rows x BB=128 batch lanes); the column loop
is a `fori_loop` whose carries stay on-chip. The vertical-gap recurrence
uses the same decayed-running-max factorization as ops.sw (module
docstring there), with cummax done as log2(W) masked `pltpu.roll` steps.

Parity: bit-identical to ops.sw.sw_pass for every output field (enforced
by tests/test_sw_pallas.py, which also re-runs the ssw.c oracle cases).
Flag-gated via sw_align_ends(..., use_pallas=True) / SAPLING_SW_PALLAS=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 30)
BB = 128          # batch lanes per grid step
FIELDS = 8        # score, ref_end, read_end, score2, ref_end2, pad...


def _kernel(q_ref, ref_ref, qlen_ref, rlen_ref, term_ref, out_ref,
            colmax_ref, *, w, r, match, mismatch, gap_open, gap_extend,
            mask_len, pad_to, second_inclusive, score_only=False):
    q = q_ref[:]                                   # [W, BB] int32
    qlen = qlen_ref[:]                             # [1, BB]
    rlen = rlen_ref[:]
    term = term_ref[:]
    # pin every scalar to int32: under global x64 a weak Python-int pair
    # in jnp.where defaults to int64, which Mosaic cannot lower
    match = jnp.int32(match)
    mismatch = jnp.int32(mismatch)
    gap_open = jnp.int32(gap_open)
    gap_extend = jnp.int32(gap_extend)
    mask_len = jnp.int32(mask_len)
    pad_to = jnp.int32(pad_to)
    zero = jnp.int32(0)
    minus1 = jnp.int32(-1)

    jidx = jax.lax.broadcasted_iota(jnp.int32, (w, BB), 0)
    valid_row = jidx < qlen                        # real query rows
    padlen = ((qlen + (pad_to - jnp.int32(1))) // pad_to) * pad_to
    live_row = jidx < padlen                       # real + SSE pad rows
    ge_j = gap_extend * jidx
    neg = jnp.full((w, BB), NEG, jnp.int32)

    # shift masks are loop-invariant: build them ONCE before the column
    # fori_loop (inside the body Mosaic re-evaluates the iota compare
    # every column — 7 cummax steps x r columns of pure overhead)
    smasks = {}
    _s = 1
    while _s < w:
        smasks[_s] = jidx >= _s
        _s *= 2

    def shift_down(x, s, fill):
        rolled = pltpu.roll(x, jnp.int32(s), axis=0)
        return jnp.where(smasks[s], rolled, fill)

    def cummax_rows(x):
        s = 1
        while s < w:
            x = jnp.maximum(x, shift_down(x, s, neg))
            s *= 2
        return x

    if score_only:
        # Per-cell running max; no column reductions, no best-column
        # snapshot, no colmax scratch, no terminate. Same recurrence and
        # masks as the full sweep — the score VALUE is bit-identical
        # (the fused winner program needs only it for non-winners).
        zero_w0 = jnp.zeros((w, BB), jnp.int32)

        def column_s(i, carry):
            h, e, best_h = carry
            rbase = ref_ref[pl.ds(i, 1), :]
            sub = jnp.where((q == rbase) & (q < 4), match, -mismatch)
            sub = jnp.where(valid_row, sub, zero)
            diag = shift_down(h, 1, zero_w0)
            h_nof = jnp.maximum(jnp.maximum(diag + sub, e), 0)
            h_nof = jnp.where(live_row, h_nof, zero)
            a = shift_down(h_nof - gap_open, 1, neg)
            f = cummax_rows(a + ge_j) - ge_j
            h_new = jnp.where(live_row, jnp.maximum(h_nof, f), zero)
            e_new = jnp.where(live_row,
                              jnp.maximum(e - gap_extend,
                                          h_new - gap_open),
                              jnp.int32(NEG))
            col_ok = i < rlen                              # [1, BB]
            best_h = jnp.where(col_ok, jnp.maximum(best_h, h_new), best_h)
            h = jnp.where(col_ok, h_new, h)
            e = jnp.where(col_ok, e_new, e)
            return h, e, best_h

        h, e, best_h = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(r), column_s, (zero_w0, neg, zero_w0))
        one_b0 = jnp.zeros((1, BB), jnp.int32)
        best = jnp.max(jnp.where(valid_row, best_h, zero), axis=0,
                       keepdims=True)
        out_ref[pl.ds(0, 1), :] = best
        for fi in range(1, FIELDS):
            out_ref[pl.ds(fi, 1), :] = one_b0
        return

    def column(i, carry):
        h, e, best, best_ref, best_col, done = carry
        rbase = ref_ref[pl.ds(i, 1), :]            # [1, BB]
        sub = jnp.where((q == rbase) & (q < 4), match, -mismatch)
        sub = jnp.where(valid_row, sub, zero)
        diag = shift_down(h, 1, jnp.zeros_like(h))  # H[j-1], prev column
        h_nof = jnp.maximum(jnp.maximum(diag + sub, e), 0)
        h_nof = jnp.where(live_row, h_nof, zero)
        a = shift_down(h_nof - gap_open, 1, neg)
        f = cummax_rows(a + ge_j) - ge_j
        h_new = jnp.where(live_row, jnp.maximum(h_nof, f), zero)
        e_new = jnp.where(live_row,
                          jnp.maximum(e - gap_extend, h_new - gap_open),
                          jnp.int32(NEG))

        col_ok = (i < rlen) & (done == zero)                   # [1, BB]
        colmax_real = jnp.max(jnp.where(valid_row, h_new, minus1),
                              axis=0, keepdims=True)
        colmax_pad = jnp.max(jnp.where(live_row, h_new, minus1),
                             axis=0, keepdims=True)
        upd = col_ok & (colmax_real > best)
        best = jnp.where(upd, colmax_real, best)
        best_ref = jnp.where(upd, i, best_ref)
        best_col = jnp.where(upd, h_new, best_col)
        done = jnp.where(col_ok & (colmax_pad == term),
                         jnp.int32(1), done)
        h = jnp.where(col_ok, h_new, h)
        e = jnp.where(col_ok, e_new, e)
        colmax_ref[pl.ds(i, 1), :] = jnp.where(col_ok, colmax_pad, zero)
        return h, e, best, best_ref, best_col, done

    zero_w = jnp.zeros((w, BB), jnp.int32)
    one_b = jnp.zeros((1, BB), jnp.int32)
    init = (zero_w, neg, one_b, one_b - 1, zero_w,
            jnp.zeros((1, BB), jnp.int32))     # done: int32 mask — a bool
                                               # loop carry fails Mosaic's
                                               # scf.for legalization
    h, e, best, best_ref, best_col, done = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(r), column, init)

    # read_end: smallest real row attaining the max in the best column
    hit = valid_row & (best_col == best)
    big = jnp.int32(1 << 30)
    first_hit = jnp.min(jnp.where(hit, jidx, big), axis=0, keepdims=True)
    read_end = jnp.where(first_hit < big, first_hit, qlen - jnp.int32(1))

    # second best: best column max outside [ref_end-mask, ref_end+mask]
    iidx = jax.lax.broadcasted_iota(jnp.int32, (r, BB), 0)
    lo_edge = jnp.maximum(best_ref - mask_len, jnp.int32(0))              # [1, BB]
    hi_edge = jnp.minimum(best_ref + mask_len, rlen)
    right_ok = (iidx >= hi_edge) if second_inclusive else (iidx > hi_edge)
    eligible = ((iidx < lo_edge) | right_ok) & (iidx < rlen)
    masked = jnp.where(eligible, colmax_ref[:], jnp.int32(0))
    score2 = jnp.max(masked, axis=0, keepdims=True)
    first2 = jnp.min(jnp.where(masked == score2, iidx, big),
                     axis=0, keepdims=True)
    ref_end2 = jnp.where(score2 > jnp.int32(0), first2, jnp.int32(0))

    out_ref[pl.ds(0, 1), :] = best
    out_ref[pl.ds(1, 1), :] = best_ref
    out_ref[pl.ds(2, 1), :] = read_end
    out_ref[pl.ds(3, 1), :] = score2
    out_ref[pl.ds(4, 1), :] = ref_end2
    out_ref[pl.ds(5, 1), :] = one_b
    out_ref[pl.ds(6, 1), :] = one_b
    out_ref[pl.ds(7, 1), :] = one_b


@functools.partial(
    jax.jit,
    static_argnames=("match", "mismatch", "gap_open", "gap_extend",
                     "mask_len", "pad_to", "second_inclusive", "interpret",
                     "score_only"),
)
def sw_pass_pallas(
    query, qlen, ref, rlen, terminate,
    *, match: int = 2, mismatch: int = 2, gap_open: int = 3,
    gap_extend: int = 1, mask_len: int = 15, pad_to: int = 16,
    second_inclusive: bool = False, interpret: bool = False,
    score_only: bool = False,
):
    """Drop-in Pallas equivalent of ops.sw.sw_pass (same args/returns)."""
    if gap_open < gap_extend:
        raise ValueError("decayed-max F factorization requires gapO >= gapE")
    b0, w0 = query.shape
    r0 = ref.shape[1]
    # lane-pad the batch, sublane-pad W (incl. room for SSE pad rows) and R
    b = ((b0 + BB - 1) // BB) * BB
    w = ((w0 + pad_to - 1) // pad_to) * pad_to
    w = ((w + 7) // 8) * 8
    r = ((r0 + 7) // 8) * 8
    q = jnp.zeros((b, w), jnp.int32).at[:b0, :w0].set(query.astype(jnp.int32))
    rf = jnp.zeros((b, r), jnp.int32).at[:b0, :r0].set(ref.astype(jnp.int32))
    ql = jnp.ones((b,), jnp.int32).at[:b0].set(qlen.astype(jnp.int32))
    rl = jnp.ones((b,), jnp.int32).at[:b0].set(rlen.astype(jnp.int32))
    tm = jnp.full((b,), -1, jnp.int32).at[:b0].set(terminate.astype(jnp.int32))

    grid = (b // BB,)
    out = pl.pallas_call(
        functools.partial(
            _kernel, w=w, r=r, match=match, mismatch=mismatch,
            gap_open=gap_open, gap_extend=gap_extend, mask_len=mask_len,
            pad_to=pad_to, second_inclusive=second_inclusive,
            score_only=score_only),
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, BB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, BB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), lambda i: (jnp.int32(0), i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((FIELDS, BB), lambda i: (jnp.int32(0), i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((FIELDS, b), jnp.int32),
        scratch_shapes=[pltpu.VMEM((r, BB), jnp.int32)],
        interpret=interpret,
    )(q.T, rf.T, ql[None, :], rl[None, :], tm[None, :])

    if score_only:
        return {"score": out[0, :b0]}
    return {
        "score": out[0, :b0],
        "ref_end": out[1, :b0],
        "read_end": out[2, :b0],
        "score2": out[3, :b0],
        "ref_end2": out[4, :b0],
    }
