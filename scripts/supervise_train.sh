#!/bin/bash
# Generic training supervisor: launch a train command, watch its stdout
# log for progress (byte growth), kill + relaunch resuming from the
# newest checkpoint on stalls or crashes.
#
# The framework checkpoints the FULL TrainState (params, optimizer,
# normalizer, RNG, episode counter — utils/checkpoint.py), so a resume
# via --model_dir is exact; this script turns that into unattended
# fault tolerance (SURVEY §5.3 — the reference's only recovery story is
# SMAC's SC2 full_restart). Also covers remote-TPU tunnel stalls, which
# present as a healthy process making no progress.
#
# Usage:
#   scripts/supervise_train.sh RUNROOT LOGFILE STALL_SECONDS -- CMD...
#   e.g. scripts/supervise_train.sh \
#       results/Hanabi/Hanabi-Full/mappo/paper /tmp/train.log 480 -- \
#       python -u -m onpolicy_tpu.scripts.train_hanabi --algorithm_name mappo ...
#
# RUNROOT is the experiment dir that contains run*/models; the newest
# models dir with a latest.txt pointer is passed as --model_dir on
# every (re)launch after the first checkpoint exists.
set -u
RUNROOT=$1; CUR=$2; STALL_S=$3
shift 3
[ "$1" = "--" ] && shift
SUPLOG=${CUR%.log}.supervisor.log
ATTEMPT=0
PID=""

launch() {
  ATTEMPT=$((ATTEMPT+1))
  MD=$(ls -dv "$RUNROOT"/run*/models 2>/dev/null | while read -r d; do
         [ -f "$d/latest.txt" ] && echo "$d"; done | tail -1)
  EXTRA=()
  [ -n "${MD:-}" ] && EXTRA=(--model_dir "$MD")
  echo "$(date) attempt $ATTEMPT launching (resume: ${MD:-none})" >> "$SUPLOG"
  "$@" "${EXTRA[@]}" > "$CUR" 2>&1 &
  PID=$!
}

launch "$@"
last_size=0; stall=0
while true; do
  sleep 60
  if ! kill -0 "$PID" 2>/dev/null; then
    wait "$PID"; RC=$?
    echo "$(date) trainer $PID exited rc=$RC" >> "$SUPLOG"
    if [ "$RC" -eq 0 ]; then
      # clean completion — do NOT respawn (a relaunch would exit
      # immediately with no episodes left and loop forever)
      echo "$(date) training completed cleanly — supervisor done" >> "$SUPLOG"
      exit 0
    fi
    sleep 20
    launch "$@"
    last_size=0; stall=0
    continue
  fi
  size=$(stat -c %s "$CUR" 2>/dev/null || echo 0)
  if [ "$size" -gt "$last_size" ]; then
    last_size=$size; stall=0
  else
    stall=$((stall+60))
  fi
  if [ "$stall" -ge "$STALL_S" ]; then
    echo "$(date) no log growth for ${stall}s — killing $PID" >> "$SUPLOG"
    kill -9 "$PID"
    sleep 20
    launch "$@"
    last_size=0; stall=0
  fi
done
