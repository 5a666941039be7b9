"""Dense compute kernels (JAX / Pallas): transforms, prediction, motion,
filters, RD cost.  Everything here is jit-friendly: static shapes, batched
over blocks, no Python control flow on traced values."""
