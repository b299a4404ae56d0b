#!/bin/bash
# Probe the axon tunnel every PROBE_SLEEP s (default 480); when a trivial
# op completes inside 100 s, launch the session script given as $1
# (logging to $2) and exit. Gives up after PROBE_TRIES failed probes
# (default 52 ~= 7 h at the default spacing).
SESSION="${1:?session script}"
LOG="${2:?log path}"
PROBE_SLEEP="${PROBE_SLEEP:-480}"
PROBE_TRIES="${PROBE_TRIES:-52}"
cd "$(dirname "$0")/.."
for attempt in $(seq 1 "$PROBE_TRIES"); do
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
  echo "probe $attempt failed at $(date +%H:%M:%S); sleeping ${PROBE_SLEEP}s" >&2
  sleep "$PROBE_SLEEP"
done
echo "tunnel never returned; giving up" | tee -a "$LOG"
exit 1
