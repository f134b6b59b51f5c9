#!/bin/bash
# Sequential TPU job runner: executes lines of runs/r4_queue.txt one at a
# time (the box has ONE chip), appending each finished line to
# runs/r4_queue_done.txt and logging to runs/r4_logs/<n>.log.
# Exits when the queue is exhausted; safe to re-launch after appending.
cd "$(dirname "$0")/.."
QUEUE=runs/r4_queue.txt
DONE=runs/r4_queue_done.txt
mkdir -p runs/r4_logs
touch "$DONE"
while true; do
  n_done=$(wc -l < "$DONE")
  total=$(wc -l < "$QUEUE")
  if [ "$n_done" -ge "$total" ]; then
    echo "queue drained ($n_done jobs)"
    exit 0
  fi
  n=$((n_done + 1))
  line=$(sed -n "${n}p" "$QUEUE")
  echo "=== job $n: $line"
  bash -c "$line" > "runs/r4_logs/${n}.log" 2>&1
  rc=$?
  echo "$line  # rc=$rc" >> "$DONE"
  echo "=== job $n done rc=$rc"
done
