#!/bin/bash
# Copy round-5 validation artifacts (evals, summaries, stage walls, stats)
# into the repo for the judge.  Usage: collect_r5_artifacts.sh <tag> <dir>
set -e
TAG=$1; SRC=$2
DST=/root/repo/artifacts/${TAG}
mkdir -p "$DST"
for f in eval.json eval_raw.json run.log sim.log; do
  [ -f "$SRC/$f" ] && cp "$SRC/$f" "$DST/" || true
done
for f in summary.json summary_cs.csv all_stats.json alerts.json; do
  [ -f "$SRC/run/$f" ] && cp "$SRC/run/$f" "$DST/" || true
done
[ -d "$SRC/run/stats" ] && cp -r "$SRC/run/stats" "$DST/" || true
grep -E "STAGE|scaffold phase|blocked count|stackaroo|rejected|owned-frac|fixint|interior" \
  "$SRC/run.log" > "$DST/stage_walls.log" 2>/dev/null || true
du -sh "$DST"
