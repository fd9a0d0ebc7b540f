#!/bin/bash
# One-shot chip work batch: waits for the TPU tunnel to come back, then
# runs the round's chip jobs SEQUENTIALLY (never concurrently — XLA
# compilation is host-bound). Each step logs to /tmp/chipbatch/.
set -u
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
mkdir -p /tmp/chipbatch

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); print('ok', float(np.asarray(x@x)[0,0]))" \
    >/dev/null 2>&1
}

echo "[chip_batch] waiting for tunnel..."
for i in $(seq 1 40); do
  if probe; then echo "[chip_batch] tunnel up after probe $i"; break; fi
  if [ "$i" = 40 ]; then echo "[chip_batch] tunnel never returned"; exit 2; fi
  sleep 120
done

echo "[chip_batch] 1/4 bench.py"
timeout 1200 python bench.py >/tmp/chipbatch/bench.out 2>&1
echo "[chip_batch] bench rc=$? tail:"; tail -2 /tmp/chipbatch/bench.out

echo "[chip_batch] 2/4 entry()"
timeout 600 python __graft_entry__.py >/tmp/chipbatch/entry.out 2>&1
echo "[chip_batch] entry rc=$? tail:"; tail -2 /tmp/chipbatch/entry.out

echo "[chip_batch] 3/4 decode trace report"
timeout 900 python scripts/trace_reports.py --case decode \
  >/tmp/chipbatch/decode_trace.out 2>&1
echo "[chip_batch] decode trace rc=$? tail:"; tail -3 /tmp/chipbatch/decode_trace.out

echo "[chip_batch] 4/4 harness CLI probe (small shape)"
timeout 900 python -m quantizedmha_tpu.harness --kernel fa_int8 \
  --n 1024 --d-model 256 --heads 8 --warmup 1 --runs 4 --random \
  --json /tmp/chipbatch/harness.json >/tmp/chipbatch/harness.out 2>&1
echo "[chip_batch] harness rc=$? tail:"; tail -3 /tmp/chipbatch/harness.out

echo "[chip_batch] done"
