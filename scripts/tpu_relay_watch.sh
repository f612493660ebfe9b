#!/bin/bash
# Watch for the axon TPU relay to come back, then launch the round-2
# measurement queue (scripts/tpu_queue_r2.sh) exactly once.
#   nohup bash scripts/tpu_relay_watch.sh > /tmp/relay_watch.log 2>&1 &
# Probe = one tiny matmul on the default backend with a hard timeout
# (backend init HANGS while the relay is down — timeout is the signal).
set -u
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

PROBE='
import jax, jax.numpy as jnp, time
t0=time.time()
x = jnp.ones((256,256))
print("ok", float((x@x).sum()), jax.devices(), f"{time.time()-t0:.1f}s", flush=True)
'

while true; do
  if timeout 180 python -c "$PROBE" 2>&1 | grep -q '^ok '; then
    echo "RELAY UP $(date -u) — launching queue"
    bash scripts/tpu_queue_r2.sh > /tmp/tpu_queue_r2.log 2>&1
    echo "QUEUE EXITED rc=$? $(date -u)"
    exit 0
  fi
  echo "relay still down $(date -u)"
  sleep 180
done
