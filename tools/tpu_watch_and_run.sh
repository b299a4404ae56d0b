#!/bin/bash
# Probe the axon tunnel every ~8 min; when a trivial op completes inside
# 100 s, launch the session script given as $1 (logging to $2) and exit.
# Gives up after ~7 h of downtime.
SESSION="${1:?session script}"
LOG="${2:?log path}"
cd "$(dirname "$0")/.."
for attempt in $(seq 1 52); do
  if timeout 100 python - <<'EOF' >/dev/null 2>&1
import numpy as np, jax, jax.numpy as jnp
np.asarray(jnp.zeros(4) + 1.0)
EOF
  then
    echo "tunnel healthy at $(date +%H:%M:%S) (attempt $attempt); running $SESSION" | tee "$LOG"
    bash "$SESSION" >>"$LOG" 2>&1
    echo "session complete at $(date +%H:%M:%S)" >>"$LOG"
    exit 0
  fi
  echo "probe $attempt failed at $(date +%H:%M:%S); sleeping 8 min" >&2
  sleep 480
done
echo "tunnel never returned; giving up" | tee -a "$LOG"
exit 1
