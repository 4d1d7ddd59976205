"""Backend/platform resolution shared by the Pallas-vs-interpret switches.

Mosaic (Pallas compiled mode) targets real TPUs only; everywhere else the
kernels run interpreted (tests force the CPU backend) or fall back to pure-XLA
implementations. `api.generate_sdf(backend="cpu")` pins the CPU device via
`jax.default_device` while the global backend stays TPU, so the *configured
default device* wins over the global backend. Resolved OUTSIDE jit so the jit
cache keys reflect the actual mode.
"""

from __future__ import annotations

import jax

__all__ = ["default_platform", "is_tpu_platform"]

_TPU_PLATFORMS = ("tpu", "axon")


def default_platform() -> str:
    """Platform computations run on by default, honoring jax.default_device.

    jax.default_device accepts a Device or a platform string (e.g.
    jax.default_device('cpu')); handle both forms.
    """
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is None:
        return jax.default_backend()
    if isinstance(dev, str):
        return dev
    return getattr(dev, "platform", str(dev))


def is_tpu_platform() -> bool:
    return default_platform() in _TPU_PLATFORMS
