#!/bin/bash
# Babysitter: whenever the TPU relay is up and the druglike3 trainer is not
# running, (re)launch the right training phase with --resume last.
# Survives tunnel outages; chains phases:
#   phase 1  epochs 0-39  clean (--no-augment) training
#   phase 2  epochs 40-45 augmentation fine-tune (robustness, VERDICT item 6)
#   done     epoch >= 45: stop relaunching (touch /tmp/druglike3_alldone)
#
# If the relay goes DOWN while the trainer is alive, the trainer hangs
# forever in nanosleep (CLAUDE.md relay-outage note); after two consecutive
# down-checks (~40s) kill it so the next relay-up check relaunches.
cd /root/repo
echo $$ > /tmp/relay_watch.pid  # self-report: wrapper PIDs are unreliable
N=0
DOWN=0
last_epoch() {
  python - <<'PY' 2>/dev/null || echo -1
import json
try:
    print(json.load(open("output/druglike3/ckpt_last/train_meta.json"))["epoch"])
except Exception:
    print(-1)
PY
}
while true; do
  PID=$(cat /tmp/druglike3.pid 2>/dev/null)
  ALIVE=""
  [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null && ALIVE=1
  if ss -tln | grep -q ':8082 '; then
    DOWN=0
    if [ -z "$ALIVE" ] && [ ! -f /tmp/druglike3_alldone ]; then
      # one-time pre-train measurement (VERDICT r3 item 3): decode unroll
      # sweep on the idle chip before the long training run claims it
      if [ ! -f /tmp/r4_premeasure_done ]; then
        touch /tmp/r4_premeasure_done
        echo "$(date): pre-train bench_decode sweep" >> /tmp/relay_watch.log
        timeout 2400 python -u scripts/bench_decode.py --iters 3 \
          > /tmp/bench_decode_r4.log 2>&1 || true
        echo "$(date): bench_decode done" >> /tmp/relay_watch.log
      fi
      EP=$(last_epoch | tail -1)
      if [ "$EP" -ge 45 ] 2>/dev/null; then
        echo "$(date): all phases done (epoch $EP)" >> /tmp/relay_watch.log
        touch /tmp/druglike3_alldone
        continue
      fi
      if [ "$EP" -ge 39 ] 2>/dev/null; then
        PHASE="aug-finetune"
        ARGS="--corpus 20000 --valid 256 --epochs 46 --batch-size 128 \
          --image-augment-only --eval-every 2 --save-path output/druglike3 \
          --resume last --dispatch 12"
      else
        PHASE="clean"
        ARGS="--corpus 20000 --valid 256 --epochs 40 --batch-size 128 \
          --no-augment --eval-every 4 --save-path output/druglike3 --resume last --dispatch 12"
      fi
      N=$((N+1))
      sleep 10
      nohup python -u scripts/train_druglike.py $ARGS \
        > /tmp/druglike3_auto$N.log 2>&1 &
      echo $! > /tmp/druglike3.pid
      echo "$(date): relaunch #$N [$PHASE, from epoch $EP] pid $(cat /tmp/druglike3.pid)" >> /tmp/relay_watch.log
      sleep 120  # give it time to claim before re-checking
    fi
  else
    if [ -n "$ALIVE" ]; then
      DOWN=$((DOWN+1))
      if [ "$DOWN" -ge 2 ]; then
        echo "$(date): relay down x$DOWN, killing hung trainer pid $PID" >> /tmp/relay_watch.log
        kill "$PID" 2>/dev/null
        sleep 5
        kill -9 "$PID" 2>/dev/null
        rm -f /tmp/druglike3.pid
        DOWN=0
      fi
    else
      DOWN=0
    fi
  fi
  sleep 20
done
