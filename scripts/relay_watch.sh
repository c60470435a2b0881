#!/bin/bash
# Babysitter: whenever the TPU relay is up and the managed trainer is not
# running, (re)launch the right training phase with --resume last.
# Survives tunnel outages; chains phases:
#   run 1 (output/druglike3, 20k corpus):
#     phase 1  epochs 0-39  clean (--no-augment) training
#     phase 2  epochs 40-45 augmentation fine-tune (robustness)
#     done     epoch >= 45 -> touch /tmp/druglike3_alldone
#   run 2 (output/druglike60k, 60k corpus — round-5 stretch, prebuilt cache):
#     phase 1  epochs 0-29  clean
#     phase 2  epochs 30-31 clutter-only fine-tune (default-style renders +
#              the perturbed suite's clutter family; the photometric recipe
#              measurably hurt at 192px — see scripts/train_druglike.py)
#     phase 3  epochs 32-43 extended mixed clean+clutter training at a
#              warm-restart LR (the 2-epoch phase-2 ran at end-of-cosine LR
#              ~0 and moved perturbed only 2.0% -> 8.2%; rebuilding the
#              schedule with --epochs 44 resumes at ~73% through a longer
#              cosine, i.e. a real LR, on the p=0.3 clutter stream whose
#              images are still majority-clean-ink)
#     done     epoch >= 43 -> touch /tmp/druglike60k_alldone, stop
#
# Coordination with bench.py (VERDICT r4 weak #1): bench.py writes
# /tmp/bench_hold while it owns the chip (after SIGTERMing any trainer whose
# pid is in /tmp/druglike3.pid); while that file exists — and is younger
# than 30 min, to survive a crashed bench — no trainer is (re)launched.
#
# One-time premeasures (VERDICT r4 weak #5/#6): marker files are touched
# ONLY on success, each attempt is retried on later passes (max 3), and the
# results are copied into the repo (docs_bench_decode_r5.log /
# BENCH_OPPORTUNISTIC_r5.json) so the evidence survives even if the relay
# dies again.
#
# If the relay goes DOWN while the trainer is alive, the trainer hangs
# forever in nanosleep (CLAUDE.md relay-outage note); after two consecutive
# down-checks (~40s) kill it so the next relay-up check relaunches.
cd /root/repo
echo $$ > /tmp/relay_watch.pid  # self-report: wrapper PIDs are unreliable
N=0
DOWN=0
last_epoch() {
  SAVE_PATH="$1" python - <<'PY' 2>/dev/null || echo -1
import json, os
try:
    p = os.path.join(os.environ["SAVE_PATH"], "ckpt_last/train_meta.json")
    print(json.load(open(p))["epoch"])
except Exception:
    print(-1)
PY
}

bench_hold_active() {
  # active if /tmp/bench_hold exists and is < 30 min old (stale guard)
  [ -f /tmp/bench_hold ] || return 1
  local age=$(( $(date +%s) - $(stat -c %Y /tmp/bench_hold 2>/dev/null || echo 0) ))
  [ "$age" -lt 1800 ]
}

premeasure() {
  # opportunistic real-TPU bench number, committed-ready in the repo root
  if [ ! -f /tmp/r5_bench_done ] && [ "$(cat /tmp/r5_bench_tries 2>/dev/null || echo 0)" -lt 3 ]; then
    echo $(( $(cat /tmp/r5_bench_tries 2>/dev/null || echo 0) + 1 )) > /tmp/r5_bench_tries
    echo "$(date): opportunistic bench.py" >> /tmp/relay_watch.log
    if timeout 2400 python -u bench.py > /tmp/bench_opp_r5.json 2>/tmp/bench_opp_r5.err; then
      if grep -q '"value": 0.0' /tmp/bench_opp_r5.json; then
        echo "$(date): bench ran but relay was down" >> /tmp/relay_watch.log
      else
        cp /tmp/bench_opp_r5.json BENCH_OPPORTUNISTIC_r5.json
        touch /tmp/r5_bench_done
        echo "$(date): opportunistic bench ok: $(cat /tmp/bench_opp_r5.json)" >> /tmp/relay_watch.log
      fi
    else
      echo "$(date): opportunistic bench FAILED (see /tmp/bench_opp_r5.err)" >> /tmp/relay_watch.log
    fi
  fi
  # decode unroll sweep (VERDICT r4 item 4)
  if [ ! -f /tmp/r5_sweep_done ] && [ "$(cat /tmp/r5_sweep_tries 2>/dev/null || echo 0)" -lt 3 ]; then
    echo $(( $(cat /tmp/r5_sweep_tries 2>/dev/null || echo 0) + 1 )) > /tmp/r5_sweep_tries
    echo "$(date): pre-train bench_decode sweep" >> /tmp/relay_watch.log
    if timeout 2400 python -u scripts/bench_decode.py --iters 3 > /tmp/bench_decode_r5.log 2>&1 \
       && grep -q '^BEST:' /tmp/bench_decode_r5.log; then
      cp /tmp/bench_decode_r5.log docs_bench_decode_r5.log
      touch /tmp/r5_sweep_done
      echo "$(date): bench_decode done: $(grep '^BEST:' /tmp/bench_decode_r5.log)" >> /tmp/relay_watch.log
    else
      echo "$(date): bench_decode FAILED/incomplete" >> /tmp/relay_watch.log
    fi
  fi
}

while true; do
  PID=$(cat /tmp/druglike3.pid 2>/dev/null)
  ALIVE=""
  [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null && ALIVE=1
  if ss -tln | grep -q ':8082 '; then
    DOWN=0
    if bench_hold_active; then
      sleep 20
      continue
    fi
    # Wedged-connection watchdog (seen Aug 19: port UP, trainer alive, but
    # its axon connection died silently — main thread futex-waits forever
    # and the log goes quiet).  10 min of log silence safely exceeds the
    # longest legitimate quiet window (first compile ~4 min, eval ~1 min).
    if [ -n "$ALIVE" ]; then
      LOG=$(ls -t /tmp/druglike3_auto*.log 2>/dev/null | head -1)
      if [ -n "$LOG" ]; then
        AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
        if [ "$AGE" -gt 600 ]; then
          echo "$(date): trainer pid $PID wedged (log silent ${AGE}s, relay up) — killing" >> /tmp/relay_watch.log
          kill "$PID" 2>/dev/null
          sleep 5
          kill -9 "$PID" 2>/dev/null
          rm -f /tmp/druglike3.pid
          ALIVE=""
        fi
      fi
    fi
    if [ -z "$ALIVE" ] && [ ! -f /tmp/druglike60k_alldone ]; then
      premeasure
      bench_hold_active && continue
      ARGS=""
      if [ ! -f /tmp/druglike3_alldone ]; then
        EP=$(last_epoch output/druglike3 | tail -1)
        if [ "$EP" -ge 45 ] 2>/dev/null; then
          echo "$(date): 20k phases done (epoch $EP)" >> /tmp/relay_watch.log
          touch /tmp/druglike3_alldone
          continue
        fi
        if [ "$EP" -ge 39 ] 2>/dev/null; then
          PHASE="20k-aug-finetune"
          ARGS="--corpus 20000 --valid 256 --epochs 46 --batch-size 128 \
            --image-augment-only --eval-every 2 --save-path output/druglike3 \
            --resume last --dispatch 12"
        else
          PHASE="20k-clean"
          ARGS="--corpus 20000 --valid 256 --epochs 40 --batch-size 128 \
            --no-augment --eval-every 4 --save-path output/druglike3 --resume last --dispatch 12"
        fi
      else
        EP=$(last_epoch output/druglike60k | tail -1)
        if [ "$EP" -ge 43 ] 2>/dev/null; then
          echo "$(date): 60k phases done (epoch $EP)" >> /tmp/relay_watch.log
          touch /tmp/druglike60k_alldone
          continue
        fi
        if [ "$EP" -ge 29 ] 2>/dev/null; then
          # phase 3 (subsumes the old 2-epoch phase 2): mixed clean+clutter
          # at a warm-restart LR — rebuilding the cosine with --epochs 44
          # puts the resumed step at ~73% of the schedule instead of 99%
          PHASE="60k-mixed-extended"
          ARGS="--corpus 60000 --valid 384 --epochs 44 --batch-size 128 \
            --image-augment-only --eval-every 2 --save-path output/druglike60k \
            --resume last --dispatch 12"
        else
          PHASE="60k-clean"
          ARGS="--corpus 60000 --valid 384 --epochs 30 --batch-size 128 \
            --no-augment --eval-every 3 --save-path output/druglike60k \
            --resume last --dispatch 12"
        fi
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
