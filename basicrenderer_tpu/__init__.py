"""basicrenderer_tpu: a TPU-native renderer (see README.md).

TPU correctness note: on TPU, XLA lowers f32 matmul/einsum operands to
bfloat16 MXU passes by default ("fastest"). For rendering math that silently
quantizes camera rays, world-position reconstruction, and vertex transforms
to 8 mantissa bits — measured to shift the sky horizon by ~120 rows at 1080p
and wobble geometry by ~0.4%. The framework therefore defaults to
"highest" (f32-accurate 6-pass decomposition). Hot call sites that are
provably bf16-safe opt back down with an explicit `precision=` argument.
"""

import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
