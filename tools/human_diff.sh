#!/usr/bin/env bash
# GRCh38-class (3.1 Gbp) differential, driven incrementally with per-stage
# logs and cached artifacts — the same steps as
# tests/test_scale_large.py::test_3g1_human_scale_differential, but each
# stage is resumable so the ~5h pipeline survives interruptions.
#
# Stages (each skipped when its artifact already exists):
#   1. synthesize the 3.10 Gbp genome + 5000 2x150bp read pairs
#   2. build OUR index (SA-IS over the 6.2G-char doubled genome, ~2h)
#   3. build the reference binary's index (~1.5h)
#   4. byte-compare the index files (.0123 .bwt.2bit.64 .pac .amb)
#   5. map the read set with the reference binary (1 thread)
#   6. map with our pipeline and bit-compare the SAM bodies
#
# Needs: .refbuild/bwa-mem2.ref (tools/build_reference.sh), ~90 GB RAM,
# ~60 GB disk under .tmp/human_3g1.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$REPO/.tmp/human_3g1"
REF_BIN="$REPO/.refbuild/bwa-mem2.ref"
FA="$WORK/genome.fa"
REF_PREF="$WORK/ref.genome.fa"
mkdir -p "$WORK"
cd "$REPO"

[ -x "$REF_BIN" ] || { echo "missing $REF_BIN (run tools/build_reference.sh)"; exit 1; }

log() { echo "[human_diff $(date +%H:%M:%S)] $*"; }

if [ ! -f "$FA.bwt.2bit.64" ]; then
    log "stage 1+2: dataset + our index (hours; log: $WORK/ours_index.log)"
    python tools/make_bench_data.py --dir "$WORK" --scale 66.4 \
        --pairs 5000 >"$WORK/ours_index.log" 2>&1
fi
log "our index present"

if [ ! -f "$REF_PREF.bwt.2bit.64" ]; then
    log "stage 3: reference index (hours; log: $WORK/ref_index.log)"
    "$REF_BIN" index -p "$REF_PREF" "$FA" >"$WORK/ref_index.log" 2>&1
fi
log "reference index present"

log "stage 4: byte-comparing index files"
for ext in .0123 .bwt.2bit.64 .pac .amb; do
    cmp "$FA$ext" "$REF_PREF$ext" && log "  $ext identical"
done

if [ ! -f "$WORK/ref.sam" ]; then
    log "stage 5: reference mem run (log: $WORK/ref_mem.log)"
    "$REF_BIN" mem -t 1 "$REF_PREF" "$WORK/reads_r1.fq" "$WORK/reads_r2.fq" \
        >"$WORK/ref.sam" 2>"$WORK/ref_mem.log"
fi
log "reference SAM present"

log "stage 6: our mem run + SAM body diff (log: $WORK/ours_mem.log)"
python - <<'EOF'
import os, sys
REPO = os.getcwd()
sys.path.insert(0, REPO)
WORK = os.path.join(REPO, ".tmp", "human_3g1")
sys.path.insert(0, os.path.join(REPO, "tests"))
import test_scale_large as T
T._map_both(WORK, os.path.join(WORK, "genome.fa"),
            os.path.join(WORK, "ref.genome.fa"))
print("[human_diff] SAM bodies bit-identical")
EOF
log "ALL STAGES PASSED"
