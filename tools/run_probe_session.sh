#!/bin/bash
# One-shot driver: engine tick-routing comparison + full capacity sweep.
cd /root/repo
{
  echo "=== tick routing: scan vs fused (q8_0, inner=128) ==="
  for b in 512 1024 2048; do
    for kind in scan fused; do
      echo -n "ROUTE $kind B=$b: "
      timeout 900 python tools/capacity_probe.py --single $kind q8_0 $b
    done
  done
} > /tmp/tick_dispatch.out 2>&1
echo "=== capacity sweep ===" > /tmp/capacity.log
timeout 3000 python tools/capacity_probe.py > /tmp/capacity.json 2>> /tmp/capacity.log
echo DONE > /tmp/probe_session.done
