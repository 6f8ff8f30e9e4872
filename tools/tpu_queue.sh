#!/bin/bash
# Serial TPU job queue (round 5). One job at a time on the tunneled chip
# (two processes fight over it and corrupt shared logs — CLAUDE.md).
#
# Usage: tools/tpu_queue.sh <jobsfile> [tag]
#   jobsfile lines:  <name>\t<command...>    (# comments / blanks skipped)
# Each job runs from /root/repo with output in .bench_logs/<name>.log;
# progress is appended to .bench_logs/queue.log. Waits for the tunnel
# (probe = jax.devices() within 120 s) before every job; jobs are bounded
# by a 5400 s timeout.
set -u
cd /root/repo
JOBS="$1"
TAG="${2:-QUEUE}"
LOG=.bench_logs/queue.log

probe() {
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

while IFS=$'\t' read -r name cmd; do
    [ -z "${name}" ] && continue
    case "$name" in \#*) continue;; esac
    until probe; do
        echo "--- tunnel down, waiting ($(date +%H:%M:%S))" >> "$LOG"
        sleep 240
    done
    echo "=== ${name}: ${cmd} (start $(date +%H:%M:%S))" >> "$LOG"
    timeout 5400 bash -c "$cmd" > ".bench_logs/${name}.log" 2>&1
    rc=$?
    echo "=== ${name} rc=${rc} (end $(date +%H:%M:%S))" >> "$LOG"
done < "$JOBS"
echo "${TAG} DONE" >> "$LOG"
