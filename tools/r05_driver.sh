#!/usr/bin/env bash
# Round-5 pipeline driver: babysits tools/r05_quality_run.sh to completion,
# retrying timed-out stages (each train stage now --resumes from its last
# checkpoint), then runs tools/r05_extras.sh. Survives session restarts --
# launch detached:
#   setsid nohup tools/r05_driver.sh [wait_pid] > /dev/null 2>&1 &
# If wait_pid is given, first waits for that already-running
# r05_quality_run.sh process to exit before taking over.
set -u
cd "$(dirname "$0")/.."
LOG=logs/r05_quality
mkdir -p "$LOG"
note() { echo "[driver $(date +%H:%M:%S)] $*" >> "$LOG/driver.log"; }

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  note "waiting for existing pipeline pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  note "pid $WAIT_PID exited"
fi

# Resume stage = the last "stage N FAILED" in the newest pipeline output,
# else 1 (idempotent: completed train stages resume to their max_steps and
# exit immediately; make-data is guarded by an existence check).
resume_stage() {
  local s
  s=$(grep -ho 'stage [0-9]* FAILED' "$LOG"/pipeline_r05.log "$LOG"/driver_run*.log 2>/dev/null | tail -1 | grep -o '[0-9]*')
  echo "${s:-1}"
}

TRIES=0
MAX_TRIES=6
while [ ! -f EVAL_r05.json ] && [ "$TRIES" -lt "$MAX_TRIES" ]; do
  TRIES=$((TRIES + 1))
  S=$(resume_stage)
  note "pipeline attempt $TRIES from stage $S"
  bash tools/r05_quality_run.sh "$S" >> "$LOG/driver_run$TRIES.log" 2>&1
  note "attempt $TRIES exited rc=$?"
done

if [ -f EVAL_r05.json ]; then
  note "pipeline COMPLETE -> extras"
else
  note "pipeline INCOMPLETE after $MAX_TRIES attempts -> extras anyway"
fi
bash tools/r05_extras.sh 1 >> "$LOG/extras_r05.log" 2>&1
note "extras exited rc=$?"
note "driver done"
