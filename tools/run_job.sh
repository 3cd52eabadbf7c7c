#!/bin/bash
# Submit a job file to the devserver and wait for its output.
# Usage: tools/run_job.sh <jobfile.py> [timeout_s] [jobdir]
set -u
JOB_SRC="$1"
TIMEOUT="${2:-600}"
JOB_DIR="${3:-/tmp/jobs}"

# refuse to queue against a dead server (the job would just sit there)
PIDFILE="$JOB_DIR/_devserver.pid"
if [ ! -f "$PIDFILE" ] || ! kill -0 "$(awk '{print $1}' "$PIDFILE")" 2>/dev/null; then
  echo "[run_job] no live devserver for $JOB_DIR (start: python tools/devserver.py $JOB_DIR &)"
  exit 2
fi

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
