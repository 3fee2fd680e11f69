#!/bin/bash
# Benchmark-genome fetcher (equivalent of eval/download.sh:1-29 — E. coli,
# C. elegans, GRCh38, wheat from Ensembl/ENCODE). Run on a machine with
# network access; this container is zero-egress.
set -euo pipefail
DEST="${1:-genomes}"
mkdir -p "$DEST"
cd "$DEST"

fetch () { # url out
  [ -f "$2" ] && { echo "skip $2 (exists)"; return; }
  wget -O "$2.gz" "$1" && gunzip "$2.gz"
}

fetch "https://ftp.ensemblgenomes.org/pub/bacteria/release-49/fasta/bacteria_90_collection/escherichia_coli_str_k_12_substr_mg1655/dna/Escherichia_coli_str_k_12_substr_mg1655.ASM584v2.dna.toplevel.fa.gz" ecoli.fa
fetch "https://ftp.ensembl.org/pub/release-104/fasta/caenorhabditis_elegans/dna/Caenorhabditis_elegans.WBcel235.dna.toplevel.fa.gz" celegans.fa
fetch "https://www.encodeproject.org/files/GRCh38_no_alt_analysis_set_GCA_000001405.15/@@download/GRCh38_no_alt_analysis_set_GCA_000001405.15.fasta.gz" grch38.fa
fetch "https://ftp.ensemblgenomes.org/pub/plants/release-51/fasta/triticum_aestivum/dna/Triticum_aestivum.IWGSC.dna.toplevel.fa.gz" wheat.fa
echo "done -> $DEST"
