"""Compiled-program memory budgets — the PTXAS budget tracking analog.

The reference tracked per-kernel register/SMEM budgets from PTXAS output
(`--ptxas-options=-v`, e.g. "40 regs, 6,864 B smem, 0 spills" for its
fastest kernel — profiles/md/run7/ncu_details.md:150-156). The XLA
equivalent is the compiled executable's memory analysis: argument/output
sizes, temp allocations, and the generated program's peak — this module
surfaces it per jitted function, for the same purpose (catching a block-size
change that silently doubles scratch memory).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax


@dataclasses.dataclass(frozen=True)
class MemoryBudget:
    argument_bytes: int
    output_bytes: int
    temp_bytes: int
    generated_code_bytes: int
    alias_bytes: int

    @property
    def total_bytes(self) -> int:
        return (self.argument_bytes + self.output_bytes + self.temp_bytes
                + self.generated_code_bytes - self.alias_bytes)

    def __str__(self) -> str:
        mb = 1024 * 1024
        return (
            f"args {self.argument_bytes / mb:.1f} MiB | "
            f"out {self.output_bytes / mb:.1f} MiB | "
            f"temp {self.temp_bytes / mb:.1f} MiB | "
            f"code {self.generated_code_bytes / mb:.2f} MiB | "
            f"total {self.total_bytes / mb:.1f} MiB"
        )


def memory_budget(fn: Callable, *args, **kwargs) -> Optional[MemoryBudget]:
    """Lower + compile `fn(*args)` and report its device memory budget.
    Returns None if the backend doesn't expose a memory analysis."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    try:
        ma = compiled.memory_analysis()
    except Exception:  # noqa: BLE001 — backend-dependent
        return None
    if ma is None:
        return None
    get = lambda name: int(getattr(ma, name, 0) or 0)
    return MemoryBudget(
        argument_bytes=get("argument_size_in_bytes"),
        output_bytes=get("output_size_in_bytes"),
        temp_bytes=get("temp_size_in_bytes"),
        generated_code_bytes=get("generated_code_size_in_bytes"),
        alias_bytes=get("alias_size_in_bytes"),
    )
