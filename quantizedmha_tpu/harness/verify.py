"""Numerical verification gates.

The reference's `verify_results` (reference utils/verify.cu:153-173) checks
elementwise |a-b| <= max(abs_tol, rel_tol*|b|) and aborts on the first
mismatch or non-finite value. This module is that gate, plus per-tensor
error *reports* (max-abs / mean-abs / rel) — the metric surface
BASELINE.json's "INT8 max-abs err vs FP32" asks for, which the reference
never reported (it only printed the first failing index, main.cu:97-100).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ErrorReport:
    max_abs: float
    mean_abs: float
    max_rel: float  # max_abs / max|ref|
    n_mismatch: int  # elements violating max(abs_tol, rel_tol*|ref|)
    n_nonfinite: int
    abs_tol: float
    rel_tol: float

    @property
    def ok(self) -> bool:
        return self.n_mismatch == 0 and self.n_nonfinite == 0

    def __str__(self) -> str:
        status = "PASS" if self.ok else "FAIL"
        return (
            f"[{status}] max_abs={self.max_abs:.3e} mean_abs={self.mean_abs:.3e} "
            f"max_rel={self.max_rel:.3e} mismatches={self.n_mismatch} "
            f"nonfinite={self.n_nonfinite} (tol abs={self.abs_tol:g} rel={self.rel_tol:g})"
        )


def compare(
    got,
    ref,
    abs_tol: float = 1e-3,
    rel_tol: float = 1e-3,
) -> ErrorReport:
    """Elementwise gate with the reference's tolerance semantics
    (verify.cu:161-171: tol = max(abs_tol, rel_tol*|ref|)), plus summary
    error statistics over the whole tensor."""
    got = np.asarray(got, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    if got.shape != ref.shape:
        raise ValueError(f"shape mismatch: {got.shape} vs {ref.shape}")
    # Non-finites in EITHER tensor fail the gate: a NaN in the reference
    # makes diff NaN, and `NaN > tol` is False — without this, elements
    # where the golden itself is broken would silently pass unverified.
    # (Each such element counts once, as nonfinite — matching the native
    # gate's semantics, qmha_core.cpp qmha_verify.)
    finite = np.isfinite(got) & np.isfinite(ref)
    nonfinite = int(finite.size - np.sum(finite))
    diff = np.abs(got - ref)
    tol = np.maximum(abs_tol, rel_tol * np.abs(ref))
    mismatch = int(np.sum(finite & (diff > tol)))
    finite_diff = diff[finite]
    ref_scale = float(np.max(np.abs(ref))) or 1.0
    return ErrorReport(
        max_abs=float(np.max(finite_diff)) if finite_diff.size else 0.0,
        mean_abs=float(np.mean(finite_diff)) if finite_diff.size else 0.0,
        max_rel=(float(np.max(finite_diff)) if finite_diff.size else 0.0) / ref_scale,
        n_mismatch=mismatch,
        n_nonfinite=nonfinite,
        abs_tol=abs_tol,
        rel_tol=rel_tol,
    )


def assert_close(got, ref, abs_tol: float = 1e-3, rel_tol: float = 1e-3, what: str = ""):
    report = compare(got, ref, abs_tol=abs_tol, rel_tol=rel_tol)
    assert report.ok, f"{what} {report}"
    return report
