#!/bin/bash
# Babysitter: whenever the TPU relay is up and the druglike3 trainer is not
# running, (re)launch it with --resume last. Survives tunnel outages.
cd /root/repo
N=0
while true; do
  if ss -tln | grep -q ':8082 '; then
    PID=$(cat /tmp/druglike3.pid 2>/dev/null)
    if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
      N=$((N+1))
      sleep 10
      nohup python -u scripts/train_druglike.py --corpus 20000 --valid 256 \
        --epochs 40 --batch-size 128 --no-augment --eval-every 4 \
        --save-path output/druglike3 --resume last --dispatch 12 \
        > /tmp/druglike3_auto$N.log 2>&1 &
      echo $! > /tmp/druglike3.pid
      echo "$(date): relaunch #$N pid $(cat /tmp/druglike3.pid)" >> /tmp/relay_watch.log
      sleep 120  # give it time to claim before re-checking
    fi
  fi
  sleep 20
done
