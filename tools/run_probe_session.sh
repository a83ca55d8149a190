#!/bin/bash
# One-shot driver: engine tick-routing comparison + full capacity sweep.
#
# The --single invocations run with JAX_PLATFORMS stripped (matching
# probe()'s worker env) so a CPU-forcing shell env can't silently turn the
# routing numbers into CPU timings. The sweep itself has no outer timeout:
# each probe worker already carries its own 900 s timeout, and
# capacity_probe.py streams partial results to stderr, so the per-worker
# timeouts are the only bound that doesn't risk losing the summary.
cd /root/repo
{
  echo "=== tick routing: scan vs fused (q8_0, inner=128) ==="
  for b in 512 1024 2048; do
    for kind in scan fused; do
      echo -n "ROUTE $kind B=$b: "
      timeout 900 env -u JAX_PLATFORMS python tools/capacity_probe.py --single $kind q8_0 $b
    done
  done
} > /tmp/tick_dispatch.out 2>&1
echo "=== capacity sweep ===" > /tmp/capacity.log
python tools/capacity_probe.py > /tmp/capacity.json 2>> /tmp/capacity.log
echo DONE > /tmp/probe_session.done
