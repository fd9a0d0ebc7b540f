"""Non-JAX frontends.

The reference shipped pybind11 bindings so PyTorch and JAX users could call
its CUDA `solve` through raw device pointers (extensions/torch/torch_ext.cpp,
extensions/jax/jax_binding.py). In this framework the JAX "binding" is the
package itself — `quantizedmha_tpu.api.solve` IS a jittable JAX function —
so only the torch frontend needs an adapter.
"""
