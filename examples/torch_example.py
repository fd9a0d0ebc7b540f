#!/usr/bin/env python
"""Torch-frontend example — extensions/torch/run_torch_example.py reborn.

The reference example allocated random CUDA tensors, ran flash_solve with a
warmup + timed loop, and dumped the output to .npy (run_torch_example.py:
43-65). Same flow here, on the TPU engine via the torch frontend.

Usage: python examples/torch_example.py [--n 4096] [--d-model 512]
       [--heads 8] [--kernel fa_int8] [--runs 10] [--out out.npy]
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--d-model", type=int, default=512)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--kernel", default="fa_int8")
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--runs", type=int, default=10)
    p.add_argument("--out", default=None, help="dump output to this .npy")
    args = p.parse_args()

    import torch

    from quantizedmha_tpu.frontends.torch_frontend import flash_solve

    g = torch.Generator().manual_seed(42)
    q = torch.randn(args.n, args.d_model, generator=g) * 0.5
    k = torch.randn(args.n, args.d_model, generator=g) * 0.5
    v = torch.randn(args.n, args.d_model, generator=g) * 0.5

    for _ in range(args.warmup):
        out = flash_solve(q, k, v, args.d_model, args.heads, kernel=args.kernel)

    t0 = time.perf_counter()
    for _ in range(args.runs):
        out = flash_solve(q, k, v, args.d_model, args.heads, kernel=args.kernel)
    dt = (time.perf_counter() - t0) / args.runs
    print(f"{args.kernel}: {dt * 1e3:.3f} ms/iter (incl. torch<->jax transfer) "
          f"out={tuple(out.shape)} {out.dtype}")

    if args.out:
        np.save(args.out, out.numpy())
        print(f"saved {args.out}")


if __name__ == "__main__":
    main()
