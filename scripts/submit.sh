#!/usr/bin/env bash
# Two-cluster-size scaling evidence (north_rule): run the identical
# spark-submit --py-files streaming job at N and 4N cores on the SAME
# staged input, report throughput at both + efficiency.
#
# Usage: scripts/submit.sh [SF_NAME] [N_SMALL] [N_BIG]
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-sf0.1}"
SMALL="${2:-8}"
BIG="${3:-32}"
WORK="$(mktemp -d /tmp/adt_submit_XXXX)"
trap 'rm -rf "$WORK"' EXIT

# package zip for --py-files (the real-cluster ship mechanism)
ZIP="$WORK/adt.zip"
(python - <<EOF
import zipfile, os
with zipfile.ZipFile("$ZIP", "w") as z:
    for root, _, files in os.walk("auto_data_tokenize_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
EOF
)

# deterministic staged input, shared by both runs; replicate 16x so
# compute dominates fixed per-job overhead (see BASELINE.md)
REPLICATE="${REPLICATE:-16}"
python - <<EOF
from auto_data_tokenize_spark import datagen
from auto_data_tokenize_spark.streaming import source
d = datagen.ensure_sf("$SF")
source.stage_stream_input(f"{d}/transcripts.parquet", "$WORK/in",
                          n_files=128, replicate=$REPLICATE)
source.stage_stream_input(f"{d}/transcripts.parquet", "$WORK/warm", n_files=2)
EOF

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

run() {
  local cores="$1" tag="$2" sink="$3"
  "$SPARK_SUBMIT" --master "local[$cores]" \
    --driver-memory "${DRIVER_MEM:-16g}" \
    --conf spark.sql.shuffle.partitions="$cores" \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    scripts/streaming_job.py \
    --input "$WORK/in" --output "$WORK/out_$tag" \
    --checkpoint "$WORK/ckpt_$tag" --mode tokenize --sink "$sink" \
    --warmup-input "$WORK/warm" \
    --max-files-per-trigger "${TRIGGER:-16}" 2>/dev/null | tail -1
}

echo "== N=$SMALL cores, engine path (noop sink) =="
E1=$(run "$SMALL" small_noop noop); echo "$E1"
echo "== 4N=$BIG cores, engine path (noop sink) =="
E2=$(run "$BIG" big_noop noop); echo "$E2"
echo "== N=$SMALL cores, end-to-end (commit-log sink, local disk) =="
R1=$(run "$SMALL" small table); echo "$R1"
echo "== 4N=$BIG cores, end-to-end (commit-log sink, local disk) =="
R2=$(run "$BIG" big table); echo "$R2"

python - <<EOF
import json
def eff(a, b, key):
    ta, tb = a.get(key) or a["rows_per_sec"], b.get(key) or b["rows_per_sec"]
    return round((tb / ta) / (b["cores"] / a["cores"]), 3)
e1 = json.loads('''$E1'''); e2 = json.loads('''$E2''')
r1 = json.loads('''$R1'''); r2 = json.loads('''$R2''')
print(json.dumps({
    "engine_path": {"small": e1, "big": e2,
                    "efficiency_steady": eff(e1, e2, "steady_rows_per_sec")},
    "end_to_end": {"small": r1, "big": r2,
                   "efficiency_steady": eff(r1, r2, "steady_rows_per_sec")},
}))
EOF
