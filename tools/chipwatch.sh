#!/bin/sh
# Chip watcher: probe the tunneled TPU until it answers, then run the
# recovery chain (tools/recovery_chain.sh) exactly once. Committed
# in-repo (round-4 lesson: the previous watcher lived only in /tmp and
# died with a VM reset) — arm it after any reboot with:
#
#   nohup sh tools/chipwatch.sh > /tmp/chipwatch.log 2>&1 &
#   echo $! > /tmp/chipwatch.pid
#
# Probe design per docs/outage_runbook.md: a fresh process each time
# (a failed backend init poisons its process), 600-s bound (healthy
# worst-case first dispatch is ~527 s), every 10 min. Stops probing
# 40 min before /tmp/ROUND5_DEADLINE so the chip is never touched when
# the driver's graded bench may start.
cd "$(dirname "$0")/.."
DEADLINE=$(cat "${RDT_DEADLINE_FILE:-/tmp/ROUND5_DEADLINE}" 2>/dev/null \
  || echo 9999999999)

while [ "$(date +%s)" -le "$((DEADLINE - 2400))" ]; do
  if timeout 600 python -c "
import jax, jax.numpy as jnp
jax.devices()
(jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
print('chip answered')
"; then
    date > /tmp/CHIP_UP
    echo "chip up at $(cat /tmp/CHIP_UP); starting recovery chain"
    sh tools/recovery_chain.sh /tmp/recovery
    echo "chain rc=$?"
    date > /tmp/CHAIN_DONE
    exit 0
  fi
  echo "probe failed at $(date); retry in 10 min"
  sleep 600
done
echo "deadline window closed without a live chip"
