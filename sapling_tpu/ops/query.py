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


def probe_window(packed, pos, q_words, *, n: int, length: int) -> Probe:
    """probe_at over a [W, B] window of positions sharing per-lane queries.

    One wide parallel gather round instead of W sequential probes; compare
    math identical to probe_at with a leading window axis. The window and
    word axes LEAD (shapes [WQ, W, B]) so the big batch axis stays in TPU
    lanes — trailing tiny axes would pad 3 -> 128 and blow up HBM.
    """
    wq = (length + BASES_PER_WORD - 1) // BASES_PER_WORD
    w0 = (pos >> 4).astype(jnp.int32)                     # [W, B]
    sh = ((pos & 15) << 1).astype(jnp.uint32)[None]       # [1, W, B]
    idxs = w0[None] + jnp.arange(wq + 1, dtype=jnp.int32)[:, None, None]
    rw = jnp.take(packed, idxs)                           # [WQ+1, W, B]
    left = rw[:wq] << sh
    right = jnp.where(sh == 0, jnp.uint32(0), rw[1:] >> ((32 - sh) & 31))
    aligned = left | right                                # [WQ, W, B]
    qwT = q_words.T[:, None, :]                           # [WQ, 1, B]
    diff = aligned ^ qwT
    neq = diff != 0
    any_diff = neq.any(axis=0)
    fw = jnp.argmax(neq, axis=0)                          # [W, B]
    dw = jnp.take_along_axis(diff, fw[None], axis=0)[0]
    lcp_raw = jnp.where(
        any_diff,
        fw.astype(jnp.int32) * BASES_PER_WORD + (_clz32(dw) >> 1),
        jnp.int32(length),
    )
    rem = jnp.minimum(n - pos, length).astype(jnp.int32)
    lcp = jnp.minimum(lcp_raw, rem)
    match = lcp == length
    off_end = ~match & (lcp == rem) & (rem < length)
    qw = jnp.take_along_axis(
        jnp.broadcast_to(qwT, diff.shape), fw[None], axis=0)[0]
    aw = jnp.take_along_axis(aligned, fw[None], axis=0)[0]
    smaller = off_end | (~match & (qw > aw))
    return Probe(match=match, smaller=smaller, off_end=off_end)



def _clz64(x: jnp.ndarray) -> jnp.ndarray:
    """Count leading zeros of uint64 via smear + popcount."""
    x = x | (x >> 1)
    x = x | (x >> 2)
    x = x | (x >> 4)
    x = x | (x >> 8)
    x = x | (x >> 16)
    x = x | (x >> 32)
    return 64 - jax.lax.population_count(x).astype(jnp.int32)


def make_rank_probe(packed, rev, prefix, q_words, *, n: int, length: int,
                    idt):
    """Probe-by-suffix-array-rank closure: rank [B] -> (text pos, Probe).

    Two implementations with identical semantics:
      * packed-genome path: gather rev[rank], then gather+align 2-bit
        genome words at that position (probe_at) — the gathers are
        DEPENDENT (two HBM latency levels) and cost wq+2 elements/probe.
      * prefix path (when `prefix` is given and length <= 32): gather
        prefix[rank] (first 32 bases of the suffix at that rank, packed
        big-endian uint64) and rev[rank] INDEPENDENTLY — one latency
        level, 2 elements/probe. Zero-padded short suffixes stay exact:
        a query can only compare greater at a pad base (pad = 0 is
        minimal), and pad-equality is disambiguated by the off-end test
        n - pos < length, which the reference also applies
        (src/sapling_api.h:115-130 via getLcp running off the end).
    """
    use_prefix = prefix is not None and length <= 32
    if use_prefix:
        # All compare math in 32-bit halves: the TPU has no native 64-bit
        # integer lanes, so uint64 ops would each emulate as several VPU
        # ops. The prefix stays a uint64 array (one 8-byte gather granule);
        # the gathered value is bitcast to its two uint32 words.
        wq = (length + BASES_PER_WORD - 1) // BASES_PER_WORD
        qhi_full = q_words[:, 0]
        qlo_full = q_words[:, 1] if wq > 1 else jnp.zeros_like(q_words[:, 0])
        if length <= 16:
            mhi = ((1 << (2 * length)) - 1) << (32 - 2 * length)
            mlo = 0
        else:
            mhi = 0xFFFFFFFF
            mlo = ((((1 << (2 * (length - 16))) - 1)
                    << (32 - 2 * (length - 16))) & 0xFFFFFFFF)
        mhi = jnp.uint32(mhi)
        mlo = jnp.uint32(mlo)
        qhi = qhi_full & mhi
        qlo = qlo_full & mlo

        def probe(rank):
            pos = jnp.take(rev, rank).astype(idt)
            pw = jnp.take(prefix, rank)
            pair = jax.lax.bitcast_convert_type(pw, jnp.uint32)  # [B, 2]
            lo32, hi32 = pair[..., 0], pair[..., 1]  # little-endian halves
            phi = hi32 & mhi
            plo = lo32 & mlo
            dhi = phi ^ qhi
            dlo = plo ^ qlo
            hi_eq = dhi == 0
            any_diff = ~hi_eq | (dlo != 0)
            clz = jnp.where(hi_eq, 32 + _clz32(dlo), _clz32(dhi))
            lcp_raw = jnp.where(any_diff, clz >> 1, jnp.int32(length))
            rem = jnp.minimum(n - pos, length).astype(jnp.int32)
            lcp = jnp.minimum(lcp_raw, rem)
            match = lcp == length
            off_end = ~match & (lcp == rem) & (rem < length)
            q_gt = (qhi > phi) | (hi_eq & (qlo > plo))
            smaller = off_end | (~match & q_gt)
            return pos, Probe(match=match, smaller=smaller, off_end=off_end)

        return probe

    def probe(rank):
        pos = jnp.take(rev, rank).astype(idt)
        return pos, probe_at(packed, pos, q_words, n=n, length=length)

    return probe


def _state_dtype(storage_dtype):
    """Signed per-lane state dtype for a given rank-array storage dtype.

    rev/inv may be stored uint32 for 2^31 <= n < 2^32 genomes (GRCh38-scale
    fits one chip's HBM at 4 bytes/rank); lane state (lo/hi/res) must be
    signed (-1 sentinel) and hold n, so it promotes to int64.
    """
    import numpy as _np

    if _np.dtype(storage_dtype) == _np.uint32:
        return jnp.int64
    return storage_dtype


def _masked_binary_search(probe_fn, lo, hi, res, resolved):
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
        idx, p = probe_fn(mid)
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
        "max_over", "max_under", "max_stride_steps", "window_scan",
    ),
)
def plquery_batch(
    packed, rev, xlist, ylist, q_words, x, prefix=None,
    *, n: int, length: int, k: int, buckets: int,
    most_over: int, most_under: int, max_over: int, max_under: int,
    max_stride_steps: int = 1 << 20, window_scan: bool | None = None,
):
    """Batched Sapling::plQuery (reference: src/sapling_api.h:159-248).

    Returns int [B] text positions, -1 where the reference returns -1.
    """
    idt = _state_dtype(rev.dtype)
    probe_rank = make_rank_probe(packed, rev, prefix, q_words,
                                 n=n, length=length, idt=idt)
    pred64 = predict_pwl(x, xlist, ylist, 2 * k, buckets, n)
    pred = pred64.astype(idt)

    neg1 = jnp.array(-1, idt)
    res = jnp.full(pred.shape, -1, dtype=idt)
    pred_w = pred.astype(jnp.int64)
    e_right = jnp.minimum(jnp.int64(n - 1), pred_w + most_over).astype(idt)
    e_left = jnp.maximum(jnp.int64(0), pred_w - most_under).astype(idt)

    # The 'most' error window is usually tiny (95th-percentile bound). When
    # it is, replace the reference's sequential probe cascade with ONE wide
    # parallel probe of every rank the cascade could ever touch, then run
    # its exact decision sequence — prediction probe (:161-167), 'most'
    # edge probe (:171-174/:209-213), and the recursive binarySearch
    # (:133-153) — as register-only arithmetic over the prefetched bits.
    # Identical results, ~1 HBM round instead of ~2+log2(W).
    if window_scan is None:
        # Measured on TPU v5e: the sequential cascade wins — masked lanes
        # re-gather index 0 (cached), so its true HBM traffic is active
        # lanes only, while the wide window pays W probes per lane always
        # (10.3M q/s sequential vs 7.1M q/s windowed on the 4.6Mbp bench).
        window_scan = False
    if window_scan:
        wsz = most_over + most_under + 1
        wstart = pred_w - most_under                       # rank of row 0
        ranks = wstart[None, :] + jnp.arange(wsz, dtype=jnp.int64)[:, None]
        rank_c = jnp.clip(ranks, 0, n - 1).astype(idt)
        win_rev = jnp.take(rev, rank_c).astype(idt)        # [W, B]
        pw = probe_window(packed, win_rev, q_words, n=n, length=length)

        def at(win, rank):
            i = jnp.clip((rank.astype(jnp.int64) - wstart), 0, wsz - 1)
            return jnp.take_along_axis(win, i[None].astype(jnp.int32),
                                       axis=0)[0]

        m0, s0 = at(pw.match, pred), at(pw.smaller, pred)
        resolved = m0
        res = jnp.where(m0, at(win_rev, pred), res)
        dir_right = s0

        edge = jnp.where(dir_right, e_right, e_left)
        em, es = at(pw.match, edge), at(pw.smaller, edge)
        hit_a = ~resolved & em
        res = jnp.where(hit_a, at(win_rev, edge), res)
        resolved = resolved | hit_a
        escalate = ~resolved & jnp.where(dir_right, es, ~em & ~es)

        # emulate binarySearch(lo, hi) on the prefetched window bits
        lo = jnp.where(dir_right, pred, e_left).astype(idt)
        hi = jnp.where(dir_right, e_right, pred).astype(idt)
        active = ~resolved & ~escalate
        trips = max(wsz, 2).bit_length() + 2

        def bis(t, st):
            lo, hi, res, resolved, active = st
            base2 = hi == lo + 2
            mid = jnp.where(base2, lo + 1, lo + ((hi - lo) >> 1))
            mm, ms = at(pw.match, mid), at(pw.smaller, mid)
            mrev = at(win_rev, mid)
            now_base = active & base2
            now_match = active & ~base2 & mm
            now_fail = active & ~base2 & ~mm & (lo + 1 >= hi)
            res = jnp.where(now_base | now_match, mrev, res)
            res = jnp.where(now_fail, neg1, res)
            fin = now_base | now_match | now_fail
            resolved = resolved | (fin & ~now_fail)
            go = active & ~fin
            lo = jnp.where(go & ms, mid, lo)
            hi = jnp.where(go & ~ms, mid, hi)
            return lo, hi, res, resolved, active & ~fin

        lo, hi, res, resolved, _ = jax.lax.fori_loop(
            0, trips, bis, (lo, hi, res, resolved, active))
        # non-escalated lanes are fully decided; mark them resolved so the
        # remaining phases skip them (res already holds -1 on failures)
        resolved = resolved | ~escalate
    else:
        idx0, p0 = probe_rank(pred)
        resolved = p0.match
        res = jnp.where(p0.match, idx0, res)
        dir_right = p0.smaller  # suffix at pred < query -> search right

        # --- phase A: 'most' window edge (:171-174 right, :209-213 left) ---
        edge = jnp.where(dir_right, e_right, e_left)
        edge_idx, pa = probe_rank(jnp.where(resolved, 0, edge))
        hit_a = ~resolved & pa.match
        res = jnp.where(hit_a, edge_idx, res)
        resolved = resolved | hit_a
        # escalation (:175 right-still-smaller, :214/:221 left-still-bigger)
        bigger_a = ~pa.match & ~pa.smaller
        escalate = ~resolved & jnp.where(dir_right, pa.smaller, bigger_a)

        # good-case bounds
        lo = jnp.where(dir_right, pred, e_left)
        hi = jnp.where(dir_right, e_right, pred)

    # --- phase B: 'max' window edge (:180-183 right, :225-228 left) --------
    b_right = jnp.minimum(jnp.int64(n - 1), pred_w + max_over + 1).astype(idt)
    b_left = jnp.maximum(jnp.int64(0), pred_w - max_under - 1).astype(idt)
    bedge = jnp.where(dir_right, b_right, b_left)
    bedge_idx, pb = probe_rank(jnp.where(escalate, bedge, 0))
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
            pidx, pc = probe_rank(jnp.where(active, probe_pos, 0))
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
    res, resolved = _masked_binary_search(probe_rank, lo, hi, res, resolved)
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
    idt = _state_dtype(rev.dtype)
    b = q_words.shape[0]
    res = jnp.full((b,), -1, dtype=idt)

    idx_lo = jnp.take(rev, jnp.zeros((b,), jnp.int32)).astype(idt)
    p_lo = probe_at(packed, idx_lo, q_words, n=n, length=length)
    res = jnp.where(p_lo.match, idx_lo, res)
    resolved = p_lo.match
    idx_hi = jnp.take(rev, jnp.full((b,), n - 1, jnp.int64)).astype(idt)
    p_hi = probe_at(packed, idx_hi, q_words, n=n, length=length)
    hit = ~resolved & p_hi.match
    res = jnp.where(hit, idx_hi, res)
    resolved = resolved | hit

    lo = jnp.zeros((b,), idt)
    hi = jnp.full((b,), n - 1, idt)
    probe_rank = make_rank_probe(packed, rev, None, q_words,
                                 n=n, length=length, idt=idt)
    res, _ = _masked_binary_search(probe_rank, lo, hi, res, resolved)
    return res
