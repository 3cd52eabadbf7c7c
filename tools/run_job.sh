#!/bin/bash
# Submit a job file to the devserver and wait for its output.
# Usage: tools/run_job.sh <jobfile.py> [timeout_s] [jobdir]
set -u
JOB_SRC="$1"
TIMEOUT="${2:-600}"
JOB_DIR="${3:-/tmp/jobs}"
STEM="job_$(date +%s%N)"
cp "$JOB_SRC" "$JOB_DIR/$STEM.py"
for ((i=0; i<TIMEOUT*5; i++)); do
  if [ -f "$JOB_DIR/$STEM.done" ]; then
    cat "$JOB_DIR/$STEM.out"
    exit "$(cat "$JOB_DIR/$STEM.done")"
  fi
  sleep 0.2
done
echo "[run_job] TIMEOUT after ${TIMEOUT}s"
exit 124
