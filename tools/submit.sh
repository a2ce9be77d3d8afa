#!/usr/bin/env bash
# Launch a crawler_spark job the way the north rule prescribes:
#   spark-submit --py-files <packaged engine> <driver script> [args...]
#
# Packages crawler_spark/ into a zip (the --py-files artifact every executor
# receives) and submits.  On a real cluster add --master/--deploy-mode and
# executor sizing; local[N] here for the sandbox.
#
#   tools/submit.sh [driver_script] [spark-args...]
# Defaults to the smoke driver used by tests/test_submit_packaging.py.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DRIVER="${1:-$REPO/tools/submit_smoke_job.py}"
shift || true

ZIP="$(mktemp -d)/crawler_spark.zip"
(cd "$REPO" && python - "$ZIP" <<'EOF'
import sys, zipfile
from pathlib import Path

with zipfile.ZipFile(sys.argv[1], "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(Path("crawler_spark").rglob("*.py")):
        z.write(p, p.as_posix())
EOF
)

SPARK_SUBMIT="$(python - <<'EOF'
import pyspark, pathlib
print(pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit")
EOF
)"

exec "$SPARK_SUBMIT" \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --conf spark.sql.shuffle.partitions="${SPARK_GRAFT_CPUS:-8}" \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.adaptive.enabled=true \
  --py-files "$ZIP" \
  "$DRIVER" "$@"
