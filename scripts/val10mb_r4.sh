#!/bin/bash
# 10 Mb end-to-end chip validation under the Chromium-realistic data model
# (VERDICT r3 #5: exponential ~60 kb molecules, ~10 molecules/GEM, 0.2x
# per-molecule sampling — alarms-supernova.json:100-112).  The sim defaults
# of `simulate` are already chromium-realistic; --barcodes keeps ~48x.
set -x
DIR=${1:-/tmp/val10mb_r4}
mkdir -p "$DIR"
cd /root/repo
if [ ! -f "$DIR/sim/sample_R1.fastq.gz" ]; then
  python -m supernova_tpu simulate --out "$DIR/sim" --genome-size 10000000 \
    --repeats 200 --barcodes 4000 --whitelist-size 16384 --seed 44 \
    2>&1 | tee "$DIR/sim.log"
fi
python -m supernova_tpu run --r1 "$DIR/sim/sample_R1.fastq.gz" --r2 "$DIR/sim/sample_R2.fastq.gz" \
  --whitelist "$DIR/sim/whitelist.txt" --out "$DIR/run" --resume \
  --flavors raw,pseudohap 2>&1 | tee -a "$DIR/run.log"
python -m supernova_tpu evaluate --fasta "$DIR/run/assembly.pseudohap.fasta.gz" \
  --truth "$DIR/sim/truth_hap_a.npy" "$DIR/sim/truth_hap_b.npy" \
  2>&1 | tee "$DIR/eval.json"
python -m supernova_tpu evaluate --fasta "$DIR/run/assembly.raw.fasta.gz" \
  --truth "$DIR/sim/truth_hap_a.npy" "$DIR/sim/truth_hap_b.npy" \
  2>&1 | tee "$DIR/eval_raw.json"
