#!/usr/bin/env bash
# Cluster launcher: run any search_rs_spark CLI action via
# spark-submit --py-files (the north-rule launch surface).
#
#   scripts/submit.sh [spark-submit opts...] -- <action> [args...]
#
# Examples:
#   scripts/submit.sh --master yarn --num-executors 200 -- \
#       build s3://bucket/webtext s3://bucket/idx 0 1.0
#   scripts/submit.sh -- query /path/idx "hello world" 100
#
# In this sandbox there is no cluster manager; the same entry point runs
# as `python -m search_rs_spark ...` on local[N] (session.py ships the
# identical package zip to Python workers via addPyFile, so the code
# path is the same either way).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(python - <<PY
import sys
sys.path.insert(0, "${REPO}")
from search_rs_spark.session import build_pyfiles_zip
print(build_pyfiles_zip())
PY
)"

SUBMIT_OPTS=()
while [[ $# -gt 0 && "$1" != "--" ]]; do SUBMIT_OPTS+=("$1"); shift; done
[[ "${1:-}" == "--" ]] && shift

exec spark-submit \
  --py-files "${ZIP}" \
  "${SUBMIT_OPTS[@]}" \
  "${REPO}/scripts/submit_entry.py" "$@"
