#!/bin/bash
# Retry wrapper for the single-tenant axon TPU tunnel: backend registration
# fails transiently right after another client disconnects; retry with
# backoff before giving up.
set -u
LOG="${TPU_RUN_LOG:-/tmp/tpu_run_last.log}"
for attempt in 1 2 3 4 5 6; do
  "$@" 2>&1 | tee "$LOG"
  code=${PIPESTATUS[0]}
  if [ $code -eq 0 ]; then exit 0; fi
  if ! grep -q "Unable to initialize backend 'axon'" "$LOG"; then exit $code; fi
  echo "[tpu_run] axon backend unavailable (attempt $attempt), retrying in 15s" >&2
  sleep 15
done
exit 1
