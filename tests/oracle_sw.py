"""Independent slow oracle for striped-Smith-Waterman semantics.

Plain cell-by-cell Gotoh DP (no factorization tricks — this is the
independent check on ops/sw.py's cummax-based F) with the SSW behaviors
layered on top: SSE pad rows with substitution score 0
(reference: src/ssw.c:158-166), strict-greater column updates for the
global end (ssw.c:320-328), min-row read end (ssw.c:337-345), masked
second-best (ssw.c:355-373), and the terminate early-stop (ssw.c:333-334).
"""

from __future__ import annotations

import numpy as np


def sw_oracle(query, ref, *, match=2, mismatch=2, gap_open=3, gap_extend=1,
              mask_len=15, pad_to=16, terminate=-1, second_inclusive=False):
    q = np.asarray(query, dtype=np.int64)
    r = np.asarray(ref, dtype=np.int64)
    qlen, rlen = len(q), len(r)
    wpad = ((qlen + pad_to - 1) // pad_to) * pad_to
    neg = -(1 << 30)
    h_prev = np.zeros(wpad, dtype=np.int64)
    e_prev = np.zeros(wpad, dtype=np.int64)
    best, best_ref, best_col = 0, -1, np.zeros(wpad, dtype=np.int64)
    colmax = np.zeros(rlen, dtype=np.int64)
    stopped_at = rlen
    for i in range(rlen):
        h_cur = np.zeros(wpad, dtype=np.int64)
        e_cur = np.zeros(wpad, dtype=np.int64)
        f = neg
        for j in range(wpad):
            if j < qlen:
                sub = match if (q[j] == r[i] and q[j] < 4) else -mismatch
            else:
                sub = 0  # SSE pad row
            diag = h_prev[j - 1] if j > 0 else 0
            e = max(e_prev[j] - gap_extend, h_prev[j] - gap_open)
            f = max(f - gap_extend, (h_cur[j - 1] - gap_open) if j > 0 else neg)
            h = max(0, diag + sub, e, f)
            h_cur[j], e_cur[j] = h, e
        cm_real = int(h_cur[:qlen].max())
        cm_pad = int(h_cur.max())
        if cm_real > best:
            best, best_ref, best_col = cm_real, i, h_cur.copy()
        colmax[i] = cm_pad
        h_prev, e_prev = h_cur, e_cur
        if cm_pad == terminate:
            stopped_at = i + 1
            break
    if best_ref >= 0:
        read_end = int(np.flatnonzero(best_col[:qlen] == best)[0])
    else:
        # nothing scored > 0: SSW scans the zero pvHmax and finds row 0
        read_end = 0 if best == 0 else qlen - 1
    score2, ref_end2 = 0, 0
    lo = max(best_ref - mask_len, 0)
    hi = min(best_ref + mask_len, rlen)
    for i in range(stopped_at):
        # byte kernel excludes the right edge column (ssw.c:366 edge+1);
        # word kernel includes it (ssw.c:571 edge)
        if lo <= i < hi or (i == hi and not second_inclusive):
            continue
        if colmax[i] > score2:
            score2, ref_end2 = int(colmax[i]), i
    return {
        "score": best, "ref_end": best_ref, "read_end": read_end,
        "score2": score2, "ref_end2": ref_end2,
    }
