"""`python -m quantizedmha_tpu.harness` — the benchmark CLI."""

from quantizedmha_tpu.harness.cli import main

main()
