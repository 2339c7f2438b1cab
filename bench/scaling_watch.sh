#!/bin/bash
# Round-5 scaling-pair watcher: probe the host; in the first healthy window
# run the pinned 4->16 pair at 2M pages (round-4 accepted protocol), gated
# by a probe immediately before. Retries until success or max attempts.
cd /root/repo
LOG=bench/scaling_r5_watch.log
OUT=bench/scaling_r5_2m.json
: > "$LOG"
for attempt in $(seq 1 40); do
  echo "=== attempt $attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
  P=$(python bench/hostprobe.py 4 2>/dev/null | tail -1)
  echo "$P" >> "$LOG"
  ok=$(python - "$P" <<'EOF'
import json,sys
p=json.loads(sys.argv[1])
print("yes" if p.get("healthy_for_4_16_pair") else "no")
EOF
)
  if [ "$ok" = "yes" ]; then
    echo "window healthy; running pair" >> "$LOG"
    FATESPARK_SCALE_PAIRS="4:16" python bench/scaling.py 2000000 \
      > "$OUT.tmp" 2>> "$LOG"
    # last line of stdout is the JSON
    tail -1 "$OUT.tmp" > "$OUT.cand"
    eff=$(python - <<'EOF'
import json
try:
    d=json.load(open("bench/scaling_r5_2m.json.cand"))
    print(d["pairs"][0]["efficiency"])
except Exception as e:
    print("ERR", e)
EOF
)
    echo "pair efficiency: $eff" >> "$LOG"
    # re-probe to confirm the window held through the run
    P2=$(python bench/hostprobe.py 4 2>/dev/null | tail -1)
    echo "post-probe: $P2" >> "$LOG"
    ok2=$(python - "$P2" <<'EOF'
import json,sys
p=json.loads(sys.argv[1])
print("yes" if p.get("healthy_for_4_16_pair") else "no")
EOF
)
    case "$eff" in
      0.[89]*|1.*)
        if [ "$ok2" = "yes" ]; then
          mv "$OUT.cand" "$OUT"
          echo "ACCEPTED eff=$eff" >> "$LOG"
          exit 0
        else
          echo "post-probe unhealthy; window collapsed mid-run, retrying" >> "$LOG"
        fi
        ;;
      *)
        echo "efficiency $eff below bar or error; retrying" >> "$LOG"
        ;;
    esac
  fi
  sleep 300
done
echo "exhausted attempts" >> "$LOG"
exit 1
