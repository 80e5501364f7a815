#!/bin/bash
# Probe the axon TPU tunnel every 5 minutes; the moment a probe succeeds,
# launch the round-3 campaign (resumable — safe to re-enter). Runs until
# the campaign completes. Log: TPU_CAMPAIGN_r3/watch.log
cd /root/repo || exit 1
LOG=TPU_CAMPAIGN_r3/watch.log
mkdir -p TPU_CAMPAIGN_r3
while true; do
  echo "$(date -u +%FT%TZ) probe..." >> "$LOG"
  if timeout 300 python -u -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
    echo "$(date -u +%FT%TZ) tunnel UP — starting campaign" >> "$LOG"
    python -u tools/tpu_campaign.py >> "$LOG" 2>&1
    rc=$?
    echo "$(date -u +%FT%TZ) campaign exited rc=$rc" >> "$LOG"
    if [ $rc -eq 0 ]; then
      echo "$(date -u +%FT%TZ) campaign COMPLETE" >> "$LOG"
      exit 0
    fi
    # rc=2 means probe-stage failed (tunnel dropped) — loop and retry
  else
    echo "$(date -u +%FT%TZ) tunnel down (probe timeout/fail)" >> "$LOG"
  fi
  sleep 300
done
