#!/bin/bash
# One-shot driver for the capacity + tick-routing sweep (both now inside
# capacity_probe.py, which streams partial results to
# /tmp/capacity_partial.json after every probe so nothing is lost if the
# session dies). No outer timeout: each probe worker carries its own 1800 s
# timeout — first compiles of large-B fused ticks take ~15-25 min through
# the remote-compile hop (round-3's ">900 s wedges" were exactly this).
cd /root/repo
echo "=== capacity sweep ===" > /tmp/capacity.log
python tools/capacity_probe.py > /tmp/capacity.json 2>> /tmp/capacity.log
echo DONE > /tmp/probe_session.done
