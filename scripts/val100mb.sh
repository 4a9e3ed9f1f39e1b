#!/bin/bash
# 100 Mb end-to-end chip validation (reference envelope floor:
# alarms-supernova.json:40-52 names 100 Mb as the minimum genome size).
# simulate (CPU) -> run (chip) -> evaluate; logs to $DIR/*.log
set -x
DIR=${1:-/tmp/val100mb}
mkdir -p "$DIR"
cd /root/repo
if [ ! -f "$DIR/sim/sample_R1.fastq.gz" ]; then
  python -m supernova_tpu simulate --out "$DIR/sim" --genome-size 100000000 \
    --repeats 2000 --barcodes 40000 --whitelist-size 163840 --seed 13 \
    2>&1 | tee "$DIR/sim.log"
fi
python -m supernova_tpu run --r1 "$DIR/sim/sample_R1.fastq.gz" --r2 "$DIR/sim/sample_R2.fastq.gz" \
  --whitelist "$DIR/sim/whitelist.txt" --out "$DIR/run" --resume \
  --flavors raw,pseudohap 2>&1 | tee -a "$DIR/run.log"
python -m supernova_tpu evaluate --fasta "$DIR/run/assembly.pseudohap.fasta.gz" \
  --truth "$DIR/sim/truth_hap_a.npy" "$DIR/sim/truth_hap_b.npy" \
  2>&1 | tee "$DIR/eval.log"
