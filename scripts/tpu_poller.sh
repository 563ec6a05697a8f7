#!/bin/bash
# Detached poller: probe the axon TPU tunnel every 5 min; when a trivial
# matmul round-trips, run the queued race plan (scripts/tpu_session.sh)
# exactly once. Status breadcrumbs in results/tpu_poller.status so the
# interactive session can see where we are without touching the device.
cd /root/repo || exit 1
mkdir -p results
STATUS=results/tpu_poller.status
echo "$(date -u +%FT%TZ) poller started pid=$$" > "$STATUS"
while true; do
  if timeout 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != "cpu", d
x = jnp.ones((128, 128), jnp.bfloat16)
y = jax.jit(lambda a: a @ a)(x)
import numpy as np
np.asarray(y[:1, :8])
EOF
  then
    echo "$(date -u +%FT%TZ) TPU UP — running tpu_session.sh" >> "$STATUS"
    bash scripts/tpu_session.sh
    echo "$(date -u +%FT%TZ) tpu_session.sh DONE" >> "$STATUS"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tpu still down" >> "$STATUS"
  sleep 300
done
