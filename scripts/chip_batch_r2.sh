#!/bin/bash
# Round-2 chip work batch: waits for the TPU tunnel, then runs the queued
# chip jobs SEQUENTIALLY (XLA compilation is host-bound — never overlap
# with the pytest suite or each other). Logs to /tmp/chipbatch/.
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
for i in $(seq 1 90); do
  if probe; then echo "[chip_batch] tunnel up after probe $i"; break; fi
  if [ "$i" = 90 ]; then echo "[chip_batch] tunnel never returned"; exit 2; fi
  sleep 120
done

echo "[chip_batch] 1/7 run15 ABI zero-copy A/B"
timeout 1200 python scripts/run15_abi_zero_copy.py >/tmp/chipbatch/run15.out 2>&1
echo "[chip_batch] run15 rc=$? tail:"; tail -2 /tmp/chipbatch/run15.out

echo "[chip_batch] 2/7 run14 windowed backward A/B"
timeout 1800 python scripts/run14_bwd_windowed.py >/tmp/chipbatch/run14.out 2>&1
echo "[chip_batch] run14 rc=$? tail:"; tail -2 /tmp/chipbatch/run14.out

echo "[chip_batch] 3/7 bench.py"
timeout 1200 python bench.py >/tmp/chipbatch/bench.out 2>&1
echo "[chip_batch] bench rc=$? tail:"; tail -2 /tmp/chipbatch/bench.out

echo "[chip_batch] 4/7 entry()"
timeout 600 python __graft_entry__.py >/tmp/chipbatch/entry.out 2>&1
echo "[chip_batch] entry rc=$? tail:"; tail -2 /tmp/chipbatch/entry.out

echo "[chip_batch] 5/7 run16 interleaved-prefill jitter"
timeout 1200 python scripts/run16_interleave.py >/tmp/chipbatch/run16.out 2>&1
echo "[chip_batch] run16 rc=$? tail:"; tail -2 /tmp/chipbatch/run16.out

echo "[chip_batch] 6/7 decode xprof trace summary"
timeout 1200 python scripts/trace_reports.py --case decode \
  >/tmp/chipbatch/decode_trace.out 2>&1
echo "[chip_batch] decode_trace rc=$? tail:"; tail -2 /tmp/chipbatch/decode_trace.out

echo "[chip_batch] 7/7 run17 mixed-KV serving A/B"
timeout 1800 python scripts/run17_mixed_serving.py >/tmp/chipbatch/run17.out 2>&1
echo "[chip_batch] run17 rc=$? tail:"; tail -2 /tmp/chipbatch/run17.out

echo "[chip_batch] done"
