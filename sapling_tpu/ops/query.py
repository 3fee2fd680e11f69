"""Batched TPU query engine: PWL predict -> escalating window -> masked
binary-search refinement.

This is the TPU-first inversion of the reference's scalar, pointer-chasing
query path (reference: src/sapling_api.h:98-248). One jitted array program
maps [B] packed queries to [B] genome positions:

  * prediction is exact int64 rational math (ops.predict);
  * every `getLcp` byte-compare loop (reference :115-120) becomes a packed
    2-bit word compare: gather ceil(L/16)+1 uint32 words, align with shifts,
    XOR against the packed query, and locate the first differing base with a
    count-leading-zeros built from smear+popcount — 16 bases per word, no
    data-dependent loop;
  * the recursive binary search (reference :133-153) becomes a
    `lax.while_loop` over per-lane (lo, hi, resolved) state that exits when
    every lane has resolved — all lanes move in lock-step, stragglers cost
    whole-batch iterations but each iteration is two HBM gathers;
  * the unbounded stride-scan escalation for queries longer than k
    (reference :184-196, which can loop forever on adversarial inputs) is a
    bounded masked while_loop.

LCP bookkeeping (loLcp/hiLcp) is dropped entirely: the reference only uses
min(loLcp, hiLcp) as a compare *start offset*, which never changes any
comparison outcome (the sorted-order invariant guarantees the true LCP is at
least that offset), so full-width packed compares return identical results.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pack import BASES_PER_WORD
from .predict import predict_pwl


class Probe(NamedTuple):
    match: jnp.ndarray    # bool [B]: full L-base match at pos
    smaller: jnp.ndarray  # bool [B]: suffix < query (incl. running off the end)
    off_end: jnp.ndarray  # bool [B]: comparison ran off the genome end


def _clz32(x: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of uint32 via smear + popcount."""
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    return 32 - jax.lax.population_count(x).astype(jnp.int32)


def probe_at(packed, pos, q_words, *, n: int, length: int) -> Probe:
    """Compare the L-base query against the genome at text position pos.

    packed:  uint32 [n_words+pad] big-endian 2-bit genome
    pos:     int [B] text positions (must be in [0, n))
    q_words: uint32 [B, WQ] packed queries (bits beyond L zeroed)
    """
    wq = (length + BASES_PER_WORD - 1) // BASES_PER_WORD
    w0 = (pos >> 4).astype(jnp.int32)
    sh = ((pos & 15) << 1).astype(jnp.uint32)[:, None]
    idxs = w0[:, None] + jnp.arange(wq + 1, dtype=jnp.int32)[None, :]
    rw = jnp.take(packed, idxs)  # [B, WQ+1]
    left = rw[:, :wq] << sh
    right = jnp.where(sh == 0, jnp.uint32(0), rw[:, 1:] >> ((32 - sh) & 31))
    aligned = left | right  # [B, WQ] genome window, query-aligned

    diff = aligned ^ q_words
    neq = diff != 0
    any_diff = neq.any(axis=1)
    fw = jnp.argmax(neq, axis=1)  # first differing word
    dw = jnp.take_along_axis(diff, fw[:, None], axis=1)[:, 0]
    lcp_raw = jnp.where(
        any_diff,
        fw.astype(jnp.int32) * BASES_PER_WORD + (_clz32(dw) >> 1),
        jnp.int32(length),
    )
    # Compute the in-genome remainder in the position dtype first so large
    # n - pos values cannot alias small lcp values after the int32 cast.
    rem = jnp.minimum(n - pos, length).astype(jnp.int32)
    lcp = jnp.minimum(lcp_raw, rem)
    match = lcp == length
    off_end = ~match & (lcp == rem) & (rem < length)
    qw = jnp.take_along_axis(q_words, fw[:, None], axis=1)[:, 0]
    aw = jnp.take_along_axis(aligned, fw[:, None], axis=1)[:, 0]
    q_gt_ref = qw > aw  # decided at the first differing base (big-endian pack)
    smaller = off_end | (~match & q_gt_ref)
    return Probe(match=match, smaller=smaller, off_end=off_end)


def _masked_binary_search(packed, rev, q_words, lo, hi, res, resolved,
                          *, n: int, length: int):
    """The reference's binarySearch (src/sapling_api.h:133-153) over all
    lanes at once. `res` holds text positions; -1 = not found."""

    def cond(state):
        _lo, _hi, _res, resolved = state
        return ~resolved.all()

    def body(state):
        lo, hi, res, resolved = state
        active = ~resolved
        base2 = hi == lo + 2
        mid = jnp.where(base2, lo + 1, lo + ((hi - lo) >> 1))
        mid = jnp.where(active, mid, 0)
        idx = jnp.take(rev, mid)
        p = probe_at(packed, idx, q_words, n=n, length=length)
        # base case hi==lo+2 returns rank lo+1 unconditionally (:136)
        now_base = active & base2
        now_match = active & ~base2 & p.match
        now_fail = active & ~base2 & ~p.match & (lo + 1 >= hi)
        res = jnp.where(now_base | now_match, idx, res)
        res = jnp.where(now_fail, jnp.array(-1, res.dtype), res)
        resolved = resolved | now_base | now_match | now_fail
        go = active & ~(now_base | now_match | now_fail)
        lo = jnp.where(go & p.smaller, mid, lo)
        hi = jnp.where(go & ~p.smaller, mid, hi)
        return lo, hi, res, resolved

    lo, hi, res, resolved = jax.lax.while_loop(cond, body, (lo, hi, res, resolved))
    return res, resolved


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "length", "k", "buckets", "most_over", "most_under",
        "max_over", "max_under", "max_stride_steps",
    ),
)
def plquery_batch(
    packed, rev, xlist, ylist, q_words, x,
    *, n: int, length: int, k: int, buckets: int,
    most_over: int, most_under: int, max_over: int, max_under: int,
    max_stride_steps: int = 1 << 20,
):
    """Batched Sapling::plQuery (reference: src/sapling_api.h:159-248).

    Returns int [B] text positions, -1 where the reference returns -1.
    """
    idt = rev.dtype
    pred64 = predict_pwl(x, xlist, ylist, 2 * k, buckets, n)
    pred = pred64.astype(idt)

    neg1 = jnp.array(-1, idt)
    res = jnp.full(pred.shape, -1, dtype=idt)

    idx0 = jnp.take(rev, pred)
    p0 = probe_at(packed, idx0, q_words, n=n, length=length)
    resolved = p0.match
    res = jnp.where(p0.match, idx0, res)
    dir_right = p0.smaller  # suffix at prediction < query -> search right

    # --- phase A: 'most' window edge (:171-174 right, :209-213 left) -------
    pred_w = pred.astype(jnp.int64)
    e_right = jnp.minimum(jnp.int64(n - 1), pred_w + most_over).astype(idt)
    e_left = jnp.maximum(jnp.int64(0), pred_w - most_under).astype(idt)
    edge = jnp.where(dir_right, e_right, e_left)
    edge_idx = jnp.take(rev, jnp.where(resolved, 0, edge))
    pa = probe_at(packed, edge_idx, q_words, n=n, length=length)
    hit_a = ~resolved & pa.match
    res = jnp.where(hit_a, edge_idx, res)
    resolved = resolved | hit_a
    # escalation decision (:175 right-still-smaller, :214/:221 left-still-bigger)
    bigger_a = ~pa.match & ~pa.smaller
    escalate = ~resolved & jnp.where(dir_right, pa.smaller, bigger_a)

    # good-case bounds
    lo = jnp.where(dir_right, pred, e_left)
    hi = jnp.where(dir_right, e_right, pred)

    # --- phase B: 'max' window edge (:180-183 right, :225-228 left) --------
    b_right = jnp.minimum(jnp.int64(n - 1), pred_w + max_over + 1).astype(idt)
    b_left = jnp.maximum(jnp.int64(0), pred_w - max_under - 1).astype(idt)
    bedge = jnp.where(dir_right, b_right, b_left)
    bedge_idx = jnp.take(rev, jnp.where(escalate, bedge, 0))
    pb = probe_at(packed, bedge_idx, q_words, n=n, length=length)
    hit_b = escalate & pb.match
    res = jnp.where(hit_b, bedge_idx, res)
    resolved = resolved | hit_b
    lo = jnp.where(escalate, jnp.where(dir_right, e_right, b_left), lo)
    hi = jnp.where(escalate, jnp.where(dir_right, b_right, e_left), hi)

    # --- phase C: stride scan, only for queries longer than k (:184-196,
    # :229-241). The reference's loop is unbounded and can livelock at the
    # array ends; we cap iterations and stop when the edge can't advance.
    if length > k:
        scan_r = pb.smaller & ~pb.off_end           # :186 condition
        scan_l = ~pb.match & ~pb.smaller            # :231 condition (bigger)
        active0 = escalate & ~resolved & jnp.where(dir_right, scan_r, scan_l)

        def c_cond(state):
            t, active, *_ = state
            return (t < max_stride_steps) & active.any()

        def c_body(state):
            t, active, lo, hi, res, resolved = state
            new_lo = jnp.where(dir_right, hi, lo)
            step_hi = jnp.minimum(
                jnp.int64(n - 1), hi.astype(jnp.int64) + max_over
            ).astype(idt)
            step_lo = jnp.maximum(
                jnp.int64(0), lo.astype(jnp.int64) - max_under
            ).astype(idt)
            new_hi = jnp.where(dir_right, step_hi, lo)
            new_lo = jnp.where(dir_right, new_lo, step_lo)
            probe_pos = jnp.where(dir_right, new_hi, new_lo)
            stuck = probe_pos == jnp.where(dir_right, hi, lo)
            lo = jnp.where(active, new_lo, lo)
            hi = jnp.where(active, new_hi, hi)
            pidx = jnp.take(rev, jnp.where(active, probe_pos, 0))
            pc = probe_at(packed, pidx, q_words, n=n, length=length)
            hit = active & pc.match
            res = jnp.where(hit, pidx, res)
            resolved = resolved | hit
            keep = jnp.where(dir_right, pc.smaller & ~pc.off_end,
                             ~pc.match & ~pc.smaller)
            active = active & ~hit & keep & ~stuck
            return t + 1, active, lo, hi, res, resolved

        _, _, lo, hi, res, resolved = jax.lax.while_loop(
            c_cond, c_body, (jnp.int32(0), active0, lo, hi, res, resolved)
        )

    # --- phase D: masked binary search (:245-247) ---------------------------
    res, resolved = _masked_binary_search(
        packed, rev, q_words, lo, hi, res, resolved, n=n, length=length
    )
    del resolved, neg1
    return res


@functools.partial(jax.jit, static_argnames=("n", "length"))
def binsearch_batch(packed, rev, q_words, *, n: int, length: int):
    """Batched classic suffix-array binary search — the baseline being
    beaten (reference: src/binarysearch.cpp:38-58,158-165).

    The reference's bQuery probes rank 0 and rank n-1 first, then searches
    [0, n-1]. Its recursion lacks a not-found guard and can recurse forever
    on absent queries; we resolve those lanes to -1 instead.
    """
    idt = rev.dtype
    b = q_words.shape[0]
    res = jnp.full((b,), -1, dtype=idt)

    idx_lo = jnp.take(rev, jnp.zeros((b,), idt))
    p_lo = probe_at(packed, idx_lo, q_words, n=n, length=length)
    res = jnp.where(p_lo.match, idx_lo, res)
    resolved = p_lo.match
    idx_hi = jnp.take(rev, jnp.full((b,), n - 1, idt))
    p_hi = probe_at(packed, idx_hi, q_words, n=n, length=length)
    hit = ~resolved & p_hi.match
    res = jnp.where(hit, idx_hi, res)
    resolved = resolved | hit

    lo = jnp.zeros((b,), idt)
    hi = jnp.full((b,), n - 1, idt)
    res, _ = _masked_binary_search(
        packed, rev, q_words, lo, hi, res, resolved, n=n, length=length
    )
    return res
