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

# deterministic staged input, shared by both runs
python - <<EOF
from auto_data_tokenize_spark import datagen
from auto_data_tokenize_spark.streaming import source
d = datagen.ensure_sf("$SF")
source.stage_stream_input(f"{d}/transcripts.parquet", "$WORK/in", n_files=64)
EOF

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

run() {
  local cores="$1" tag="$2"
  "$SPARK_SUBMIT" --master "local[$cores]" \
    --conf spark.sql.shuffle.partitions="$cores" \
    --conf spark.ui.enabled=false \
    --py-files "$ZIP" \
    scripts/streaming_job.py \
    --input "$WORK/in" --output "$WORK/out_$tag" \
    --checkpoint "$WORK/ckpt_$tag" --mode tokenize \
    --max-files-per-trigger 64 2>/dev/null | tail -1
}

echo "== N=$SMALL cores =="
R1=$(run "$SMALL" small); echo "$R1"
echo "== 4N=$BIG cores =="
R2=$(run "$BIG" big); echo "$R2"

python - <<EOF
import json
r1 = json.loads('''$R1'''); r2 = json.loads('''$R2''')
speedup = r1["elapsed_sec"] / r2["elapsed_sec"]
eff = speedup / (r2["cores"] / r1["cores"])
print(json.dumps({"small": r1, "big": r2,
                  "speedup": round(speedup, 3),
                  "efficiency": round(eff, 3)}))
EOF
