#!/bin/bash
# Round-3 chip work batch: runs the queued chip jobs SEQUENTIALLY (this
# box has ONE host core and XLA compilation is host-bound — never overlap
# with the pytest suite or each other).
#
# Round-2 lesson (verdict missing #1): logs go INSIDE the repo at
# profiles/raw_r3/ so every measured claim is committed, not /tmp-only.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
OUT=profiles/raw_r3
mkdir -p $OUT

probe() {
  # 150 s grace: the first contact after an idle/wedged tunnel can take
  # >90 s, and a timeout-kill mid-handshake itself wedges the tunnel for
  # minutes — a tight probe loop turns one hiccup into a standing outage.
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); print('ok', float(np.asarray(x@x)[0,0]))" \
    >/dev/null 2>&1
}

echo "[chip_batch] waiting for tunnel..."
for i in $(seq 1 60); do
  if probe; then echo "[chip_batch] tunnel up after probe $i"; break; fi
  if [ "$i" = 60 ]; then echo "[chip_batch] tunnel never returned"; exit 2; fi
  sleep 180
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[chip_batch] $name: $*"
  timeout "$tmo" "$@" >"$OUT/$name.out" 2>&1
  echo "[chip_batch] $name rc=$? tail:"; tail -3 "$OUT/$name.out"
}

# 1. run19 — fresh decomposition (calibrates the achievable-time model's
#    constants at d=32/64/128; round-2 verdict #4).
run run19_decompose 1800 python scripts/run9_ladder.py --phase decompose --rounds 5

# 2. run21 — bf16 P-V without the pipeline (verdict weak #3): deletes the
#    round + int8-cast VPU passes; accuracy judged vs the FP32 reference
#    (run9 row 7's "collapse" was a denominator artifact).
run run21_pv 1800 python scripts/run9_ladder.py --phase pv --rounds 5

# 3. run20 — headline drift probe (why 6.8 vs run9's 5.5-5.9; verdict #2).
run run20_drift 1500 python scripts/run20_headline_drift.py

# 3. run15 — ABI zero-copy A/B, re-run and committed this time (verdict
#    missing #1 / #2).
run run15_abi 1200 python scripts/run15_abi_zero_copy.py

# 4. run18 — serving roofline sweep (8B-shape decode tok/s + %HBM SoL;
#    verdict #1). Separate processes per batch size: each B is its own
#    decode_loop program; the persistent cache carries the weights-init
#    and prefill compiles across them.
run run18_b8 1800 python -m quantizedmha_tpu.harness.serving_bench \
  --batch 8 --prompt-len 512 --max-new 64 --chunk 16 --prefill
run run18_b4 1200 python -m quantizedmha_tpu.harness.serving_bench \
  --batch 4 --prompt-len 512 --max-new 64 --chunk 16
run run18_b1 1200 python -m quantizedmha_tpu.harness.serving_bench \
  --batch 1 --prompt-len 512 --max-new 64 --chunk 16
# bench.py's subprocess config, prewarmed for the driver's end-of-round run:
run run18_bench_row 1200 python -m quantizedmha_tpu.harness.serving_bench \
  --json --batch 8 --prompt-len 256 --max-new 48 --chunk 16

# 5-7. round-2 evidence re-runs (verdict missing #1).
run run14_bwd 1800 python scripts/run14_bwd_windowed.py
run run16_interleave 1200 python scripts/run16_interleave.py
run run17_mixed 1800 python scripts/run17_mixed_serving.py

# 8. decode xprof trace summary.
run decode_trace 1200 python scripts/trace_reports.py --case decode

# 9. verify surfaces on the warmed cache: the round's bench.py (robust
#    headline + achievable + const-input gate + serving row) and entry().
run bench 1200 python bench.py
run entry 600 python __graft_entry__.py

echo "[chip_batch] done"
