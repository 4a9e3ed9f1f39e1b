#!/bin/bash
# 10 Mb end-to-end chip validation (TODO item 2).
# simulate (CPU) -> run (chip) -> evaluate; logs to $DIR/val10mb.log
set -x
DIR=${1:-/tmp/val10mb}
mkdir -p "$DIR"
cd /root/repo
python -m supernova_tpu simulate --out "$DIR/sim" --genome-size 10000000 \
  --repeats 200 --barcodes 4000 --whitelist-size 16384 --seed 11 \
  2>&1 | tee "$DIR/sim.log"
python -m supernova_tpu run --r1 "$DIR/sim/sample_R1.fastq.gz" --r2 "$DIR/sim/sample_R2.fastq.gz" \
  --whitelist "$DIR/sim/whitelist.txt" --out "$DIR/run" \
  --flavors raw,pseudohap 2>&1 | tee "$DIR/run.log"
python -m supernova_tpu evaluate --fasta "$DIR/run/assembly.pseudohap.fasta.gz" \
  --truth "$DIR/sim/truth_hap_a.npy" "$DIR/sim/truth_hap_b.npy" \
  2>&1 | tee "$DIR/eval.log"
