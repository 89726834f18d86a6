#!/bin/sh
# Round-3 on-chip measurement sequence (run when the axon tunnel is up).
# Usage: sh tools/onchip_r3.sh [quick]
#   quick = skip the stream-cfg sweep and bench, just the headline A/Bs.
# Writes a timestamped log to /tmp/onchip_r3.log; the chip must be free
# (never run concurrently with pytest or another chip process).
set -x
cd "$(dirname "$0")/.."
# Reach the TPU through the axon site dir (append, never override).
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}:/root/.axon_site"
LOG=/tmp/onchip_r3.log
STAGEDIR=/tmp/onchip_r3_stages
: > "$LOG"
mkdir -p "$STAGEDIR"
N=0

# Full output goes to a per-stage file (diagnosable after the fact);
# the tail goes to the main log. bench.py gets a longer leash than the
# default 30 min — its own internal deadline is 45 min.
run() {
  N=$((N+1)); f="$STAGEDIR/$(printf %02d "$N")_$(echo "$*" | tr ' /=,' '__--' | cut -c1-80).log"
  echo "== $*" | tee -a "$LOG"
  t=1800; case "$*" in *bench.py*) t=3600;; esac
  timeout "$t" "$@" >"$f" 2>&1
  rc=$?
  tail -20 "$f" | tee -a "$LOG"
  [ "$rc" -ne 0 ] && echo "== rc=$rc (full log: $f)" | tee -a "$LOG"
}

# 1. Depth-kernel split A/B (VERDICT r2 #3): old (5,4) baseline vs the
#    new non-uniform splits. Expect (3,2)/(2,2) to cut the ~2.4 ms issue
#    overhead; auto-chooser now picks (3,2).
run python tools/depth_only.py gate=r8,up=s8,down=s8 1 8 sc=5,4
run python tools/depth_only.py gate=r8,up=s8,down=s8 1 8 sc=3,2
if [ "$1" != quick ]; then
  run python tools/depth_only.py gate=r8,up=s8,down=s8 1 8 sc=2,2
  run python tools/depth_only.py gate=r8,up=s8,down=s8 1 8 sc=1,2
fi

# 2. Kernel still bit-deterministic + sane vs XLA under the new splits.
run python tools/depth_kernel_check.py "gate=r8,up=s8,down=s8"

# 3. Whole-LM device time under the serving config (budget: 7.0 ms B=1).
run python tools/devtime.py fused-r8 -b1,8

# 4. The 16-stream serving bar at the PROTOCOL level (host costs
#    included): per-stream min RTF >= 1.0 at 16 streams is the target.
if [ "$1" != quick ]; then
  run python tools/ws_load.py --self-host flagship --streams 16
  run python tools/ws_load.py --self-host flagship --streams 8
fi

# 5. Incremental-dialogue win: per-turn FPL, KV-persistent vs re-prefill.
if [ "$1" != quick ]; then
  run python tools/dialogue_fpl.py 6 --fused=gate=r8,up=s8,down=s8
fi

# 5b. On-TPU ASR RTF, fp vs int8 hot path (beyond-reference: the
#     reference runs whisper on CUDA/CPU outside the serving chip).
if [ "$1" != quick ]; then
  run python tools/asr_bench.py
  run python tools/asr_bench.py --int8
fi

# 5c. Training throughput (steps/s, tokens/s, MFU from the XLA cost
#     model). qwen-500m fits one v5e with fp32 master + moments; bf16
#     compute + remat is the production config.
if [ "$1" != quick ]; then
  run python tools/train_bench.py --bf16 --remat dots --batch 4 --seq 512
  run python tools/train_bench.py --bf16 --remat dots --batch 8 --seq 512 --grad-accum 2
fi

# 6. Full headline bench (outage-hardened; writes the one-line JSON —
#    now includes the clone stage: cold vs cached prompt-encode FPL).
if [ "$1" != quick ]; then
  run python bench.py
fi
echo "done; log at $LOG"
