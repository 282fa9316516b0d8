"""Hot-path kernels with a Pallas TPU implementation and a pure-XLA fallback.

Selection: `attention()` and friends pick the Pallas path automatically on TPU backends
(unless disabled via `set_backend('xla')`); CPU tests always use the XLA path, so the
suite stays green on the virtual-device mesh.
"""

from diffusion_e2e_ft_tpu.kernels.attention import (
    attention,
    joint_attention,
    set_backend,
    get_backend,
)

__all__ = ["attention", "joint_attention", "set_backend", "get_backend"]
