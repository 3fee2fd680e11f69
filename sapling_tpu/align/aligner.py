"""Batched seed-and-extend read aligner.

The reference SaplingAligner (reference: src/align.cpp:151-389) aligns one
read at a time: 7 seeds per strand, one plQuery each, hit expansion via
LCP runs, then one striped-SW call per candidate window, keeping the best
strictly-greater score with a perfect-match early exit.

The TPU inversion runs the same computation in three batched phases over a
whole block of reads, then replays the reference's *serial selection
order* on the host so the chosen alignment (and therefore the SAM bytes)
is identical:

  phase 1 (device): one plquery_batch over all (read, strand, seed)
    16-mers at once;
  phase 2 (host, vectorized): seed verification + hit counting via the
    precomputed lcp>=k run-length arrays (countHitsLeft/Right semantics,
    reference: src/sapling_api.h:254-303, including the i=0-probes-
    lcp[sa_pos] quirk shared by both directions);
  phase 3 (device): one sw_align_ends over the SUPERSET of candidate
    windows any selection path could visit;
  replay (host): walk candidates in the reference's exact order — strands
    fwd,rc; seeds sorted by (total_hits, query_pos, sa_pos, left, right);
    offsets -left..right; maxHits clamping that depends on whether a best
    exists yet (src/align.cpp:310-321); strict-greater updates; early
    exit on a perfect match, which for any scoring is exactly
    score == match*read_len (full-length, zero-edit).

The never-populated `Sapling::sa` defect (src/align.cpp:287 reads an empty
vector — the shipped binary segfaults) is fixed by design: seeds use
inv[ref_pos], the semantically intended array (SURVEY.md §3.2).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import AlignerConfig
from ..ops import pack as packops
from ..ops.sw import sw_align_ends
from .cigar import Alignment, finish_alignment
from .sam import sam_header, sam_record

_COMP_CODE = np.array([3, 2, 1, 0, 4], dtype=np.uint8)  # A<->T C<->G, N=N

# SSW base translation (reference: src/ssw_cpp.cpp:12-25): upper+lowercase
# acgt map to 0..3, everything else to 4 (N, mismatches everything).
_SSW_TRANS = np.full(256, 4, dtype=np.uint8)
for _i, _b in enumerate(b"ACGT"):
    _SSW_TRANS[_b] = _i
    _SSW_TRANS[_b + 32] = _i  # lowercase

# uppercase ACGT only — what the reference's seed path effectively accepts
# (kmerize reads an uninitialized vals[] entry for anything else and the
# exact-match check query.compare(ref_seq) then fails; src/align.cpp:283-285)
_UPPER_ACGT = np.zeros(256, bool)
for _b in b"ACGT":
    _UPPER_ACGT[_b] = True

_COMP_CHAR = np.arange(256, dtype=np.uint8)
for _a, _b in zip(b"ACGT", b"TGCA"):
    _COMP_CHAR[_a] = _b


@dataclass
class AlignedRead:
    name: str
    seq: str
    qual: str
    aligned: bool
    strand: int = 0
    ref_name: str = ""
    alignment: Alignment | None = None

    def to_sam(self) -> str:
        return sam_record(self.name, self.seq, self.qual, self.aligned,
                          self.alignment, self.ref_name, self.strand)


class SeedExtendAligner:
    def __init__(self, index, cfg: AlignerConfig | None = None):
        self.idx = index
        self.cfg = cfg or AlignerConfig()
        if index.lcpk_fwd is None or index.lcpk_bwd is None:
            raise ValueError("index built without aligner arrays "
                             "(keep_aligner_arrays=True required)")
        if self.cfg.max_hits > 255:
            raise ValueError("max_hits > 255 unsupported (uint8 run arrays)")
        if index.k != self.cfg.sapling_k:
            raise ValueError(
                f"index k={index.k} != aligner sapling_k={self.cfg.sapling_k}"
                " — build the index with IndexConfig(k=sapling_k)")

    # --- seeding ------------------------------------------------------------

    def _seed_positions(self, length: int) -> list[int]:
        """Seed query offsets (reference: src/align.cpp:271-275)."""
        ns = self.cfg.num_seeds
        last = length - self.idx.k
        out = []
        for i in range(ns):
            if i == 0:
                out.append(0)
            elif i == ns - 1:
                out.append(last)
            else:
                out.append(last // (ns - 1) * i)
        return out

    def _count_hits(self, sa_pos: np.ndarray):
        """Vectorized countHitsLeft/Right (reference:
        src/sapling_api.h:254-303) — now the public
        SaplingIndex.count_hits; the reference can return left ==
        sa_pos+1 (its `sa_pos < i` stop fires one step late) and then
        reads rev[-1], UB the index method clamps away."""
        return self.idx.count_hits(sa_pos, self.cfg.max_hits)

    # --- main entry ---------------------------------------------------------

    def align_block(self, reads: list) -> list[AlignedRead]:
        """Align a block of FASTQ reads; returns per-read results in input
        order."""
        idx, cfg = self.idx, self.cfg
        k, flank, mh = idx.k, cfg.flanking, cfg.max_hits
        results: list[AlignedRead | None] = [None] * len(reads)

        # encode both strands of every usable read (SSW translation; the
        # seed path additionally requires uppercase ACGT, see _UPPER_ACGT)
        entries = []     # (ri, strand, codes, seedable)
        for ri, rd in enumerate(reads):
            raw = rd.seq if isinstance(rd.seq, bytes) else rd.seq.encode()
            seq = np.frombuffer(raw, dtype=np.uint8)
            codes = _SSW_TRANS[seq]
            if len(codes) < k:
                results[ri] = AlignedRead(
                    name=rd.name, seq=_as_str(rd.seq), qual=rd.qual,
                    aligned=False)
                continue
            # reference revComp complements UPPERCASE ACGT only and leaves
            # every other char untouched (src/align.cpp:241-256)
            rc_raw = _COMP_CHAR[seq][::-1]
            entries.append((ri, 0, codes, _UPPER_ACGT[seq]))
            entries.append((ri, 1, _SSW_TRANS[rc_raw], _UPPER_ACGT[rc_raw]))

        # --- phase 1: batched seed lookups ---------------------------------
        seed_meta = []      # (entry_i, strand, seed_i, qpos)
        seed_kmers = []     # [S, k] codes
        seed_clean = []     # seed is uppercase ACGT throughout
        for ei, (ri, strand, codes, seedable) in enumerate(entries):
            for si, qpos in enumerate(self._seed_positions(len(codes))):
                seed_meta.append((ei, strand, si, qpos))
                seed_kmers.append(codes[qpos : qpos + k])
                seed_clean.append(bool(seedable[qpos : qpos + k].all()))
        positions = np.full(len(seed_meta), -1, dtype=np.int64)
        if seed_meta:
            sk = np.stack(seed_kmers)
            valid = np.asarray(seed_clean)
            if valid.any():
                pos_v = idx.query_positions(sk[valid])
                positions[valid] = pos_v

        # --- phase 2: verify + hit counting ---------------------------------
        ref_pos = positions
        ok = (ref_pos >= 0) & (ref_pos <= idx.n - k)
        if ok.any():
            window = idx.codes[
                np.clip(ref_pos[ok, None], 0, idx.n - k)
                + np.arange(k)[None, :]
            ]
            exact = (window == np.stack(seed_kmers)[ok]).all(axis=1)
            tmp = np.zeros(len(seed_meta), bool)
            tmp[np.flatnonzero(ok)[exact]] = True
            ok = tmp
        sa_pos = np.where(ok, idx.inv[np.clip(ref_pos, 0, idx.n - 1)], 0)
        left, right = self._count_hits(sa_pos)

        # per entry: verified seeds as reference count tuples
        per_entry_counts: dict[int, list] = {ei: [] for ei in range(len(entries))}
        for gi, (ei, strand, si, qpos) in enumerate(seed_meta):
            if ok[gi]:
                per_entry_counts[ei].append((
                    int(left[gi] + right[gi] + 1), int(qpos),
                    int(sa_pos[gi]), int(left[gi]), int(right[gi]),
                ))
        for ei in per_entry_counts:
            per_entry_counts[ei].sort()

        # --- phase 3: superset candidate windows + batched SW ----------------
        # possible offset range per seed (reference: src/align.cpp:310-321):
        # total <= maxHits -> [-left, right]; else either [-mh/2-clamped]
        # (no best yet) or just {0}; the clamped range is a superset of {0}.
        cand_meta = []   # (ei, seed_order, offset)
        cand_read = []   # query codes (per candidate; shared per entry)
        cand_ref = []    # window codes
        cand_left = []   # window genome start
        wmax, rmax = 0, 0
        for ei, (ri, strand, codes, _sd) in enumerate(entries):
            ln = len(codes)
            for so, tpl in enumerate(per_entry_counts[ei]):
                total, qpos, spos, lft, rgt = tpl
                if lft + rgt > mh:
                    lft = min(lft, mh // 2)
                    rgt = min(rgt, mh // 2)
                for off in range(-lft, rgt + 1):
                    rp = int(idx.rev[spos + off])
                    lo = rp - qpos - flank
                    lo = max(lo, 0)
                    hi = rp + (ln - qpos) + flank
                    if hi >= idx.n:
                        continue
                    cand_meta.append((ei, so, off))
                    cand_read.append(codes)
                    cand_ref.append(idx.codes[lo:hi])
                    cand_left.append(lo)
                    wmax = max(wmax, ln)
                    rmax = max(rmax, hi - lo)

        ends = None
        score_by: dict = {}
        if cand_meta:
            b = len(cand_meta)
            q = np.zeros((b, wmax), np.int8)
            r = np.zeros((b, rmax), np.int8)
            ql = np.zeros(b, np.int32)
            rl = np.zeros(b, np.int32)
            for i in range(b):
                ql[i] = len(cand_read[i])
                rl[i] = len(cand_ref[i])
                q[i, : ql[i]] = cand_read[i]
                r[i, : rl[i]] = cand_ref[i]
            ends = sw_align_ends(
                q, ql, r, rl, match=cfg.match_score,
                mismatch=cfg.mismatch_penalty, gap_open=cfg.gap_open,
                gap_extend=cfg.gap_extend, mask_len=cfg.mask_len,
            )
            # materialize device results ONCE: np.asarray on a device
            # array copies device->host every call, and the replay loop
            # below reads scores per (seed, offset) candidate
            ends = {kk: np.asarray(vv) for kk, vv in ends.items()}
            for i, key in enumerate(cand_meta):
                score_by[key] = i

        # --- replay: the reference's serial selection --------------------
        for ri, rd in enumerate(reads):
            if results[ri] is not None:
                continue
            eis = [ei for ei, ent in enumerate(entries) if ent[0] == ri]
            best_score, best_i, best_strand, best_left = -1, -1, 0, 0
            done = False
            for ei in eis:                      # strand 0 then 1
                if done:
                    break
                strand = entries[ei][1]
                ln = len(entries[ei][2])
                for so, tpl in enumerate(per_entry_counts[ei]):
                    if done:
                        break
                    total, qpos, spos, lft, rgt = tpl
                    if lft + rgt > mh:
                        if best_score == -1:
                            lft = min(lft, mh // 2)
                            rgt = min(rgt, mh // 2)
                        else:
                            lft = rgt = 0
                    for off in range(-lft, rgt + 1):
                        if done:
                            break
                        i = score_by.get((ei, so, off))
                        if i is None:           # window ran off genome end
                            continue
                        sc = int(ends["score"][i])
                        if sc > best_score:
                            if sc == cfg.match_score * ln:
                                done = True     # perfect full-length match
                            best_score = sc
                            best_i = i
                            best_strand = strand
                            best_left = cand_left[i]
            if best_score > -1:
                row = {kk: vv[best_i] for kk, vv in ends.items()}
                al = finish_alignment(
                    np.asarray(cand_read[best_i], np.int8),
                    np.asarray(cand_ref[best_i], np.int8), row,
                    match=cfg.match_score, mismatch=cfg.mismatch_penalty,
                    gap_open=cfg.gap_open, gap_extend=cfg.gap_extend,
                )
            else:
                al = None
            if al is not None:
                gpos = al.ref_begin + best_left
                ref_name, last_end = _chr_of(idx.chr_ends, gpos)
                al.ref_begin = gpos - last_end
                results[ri] = AlignedRead(
                    name=rd.name, seq=_as_str(rd.seq), qual=rd.qual,
                    aligned=True, strand=best_strand, ref_name=ref_name,
                    alignment=al)
            else:
                results[ri] = AlignedRead(
                    name=rd.name, seq=_as_str(rd.seq), qual=rd.qual,
                    aligned=False)
        return results

    def align_fastq(self, fastq_path, out, cl: str = "align",
                    block: int = 4096) -> None:
        """Full FASTQ -> SAM pipeline (reference: src/align.cpp:193-224)."""
        from ..io.fastq import read_fastq

        close = False
        if isinstance(out, str):
            out = open(out, "w")
            close = True
        try:
            out.write(sam_header(self.idx.chr_ends, cl))
            buf = []
            for rd in read_fastq(fastq_path):
                buf.append(rd)
                if len(buf) >= block:
                    for ar in self.align_block(buf):
                        out.write(ar.to_sam())
                    buf = []
            if buf:
                for ar in self.align_block(buf):
                    out.write(ar.to_sam())
        finally:
            if close:
                out.close()


def _as_str(seq) -> str:
    return seq.decode() if isinstance(seq, (bytes, bytearray)) else str(seq)


def _chr_of(chr_ends, pos: int):
    """Chromosome + its start offset for a genome position (reference:
    src/align.cpp:354-372)."""
    best_end, name = 0, "*"
    last_end = 0
    for end, nm in chr_ends:
        if end > pos and (best_end == 0 or end < best_end):
            best_end, name = end, nm
        if end <= pos and (last_end == 0 or end > last_end):
            last_end = end
    return name, last_end
