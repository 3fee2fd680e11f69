#!/usr/bin/env python
"""Offline suffix-array pipeline: FASTA -> .ref -> .sa (+ optional .sap).

Equivalent of the reference's three-process shell pipeline
(reference: suffixarray/refToSuffixArray.sh:1-35 = trimRef | mksary
(libdivsufsort, int64-patched) | addlcp), collapsed into one command
around the native SA-IS builder:

    python tools/ref_to_suffix_array.py <genome.fa> [out_prefix]

Writes:
  <prefix>.ref  — filtered raw bases (trimRef.cpp:14-38 semantics:
                  uppercased, non-ACGT dropped, no newlines)
  <prefix>.sa   — reference-format [n][inv][lcpSize][lcp]
                  (addlcp.cpp:52-77)
Existing outputs are skipped (refToSuffixArray.sh:32-35 pattern).
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 1
    fa = argv[1]
    prefix = argv[2] if len(argv) > 2 else fa
    from sapling_tpu.index.suffix_array import build_suffix_data
    from sapling_tpu.io import artifacts
    from sapling_tpu.io.fasta import read_fasta

    ref_out = prefix + ".ref"
    sa_out = prefix + ".sa"
    genome = read_fasta(fa)
    print(f"filtered genome: {genome.n} bases, "
          f"{len(genome.chr_ends)} sequences")
    if not os.path.exists(ref_out):
        with open(ref_out, "wb") as f:
            f.write(genome.seq.tobytes())
        print(f"wrote {ref_out}")
    else:
        print(f"skip {ref_out} (exists)")
    if not os.path.exists(sa_out):
        t0 = time.time()
        sd = build_suffix_data(genome.seq)
        artifacts.write_sa(sa_out, sd.inv, sd.lcp)
        print(f"wrote {sa_out} (SA-IS + Kasai in {time.time() - t0:.1f}s)")
    else:
        print(f"skip {sa_out} (exists)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
