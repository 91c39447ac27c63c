"""Activation helpers with dtype-matched evaluation cost.

The reference uses torch ``nn.GELU()`` (exact erf formulation) in the MiT
MixFFN (reference: mix_transformers.py:25,43) and ConvNeXt blocks
(reference: convnext.py:35,47). On the TPU VPU, XLA's erf lowering is a long
polynomial chain that dominates elementwise runtime: measured 5.1 ms vs
1.0 ms per ConvNeXt stage-0 block @B128 bf16 on v5e for exact-vs-tanh GELU
(tools/bench_paramnet.py) — roughly 60 ms of a 284 ms e2e batch across the
28 MixFFN + 18 ConvNeXt blocks.

At bf16 output resolution the two formulations are equally accurate —
exhaustively over all 65280 finite bf16 inputs:

* global max |error| vs exact f64 GELU: tanh path 9.3e-3, erf path 9.8e-3
  (both dominated by bf16 output quantization at |x|~4);
* mismatches vs the correctly-rounded value: 1627 (tanh) vs 1606 (erf),
  almost entirely subnormal flushing;
* in the core activation range |x| <= 2 the paths are within a dozen bf16
  ulp (bit-identical on ~70% of inputs). The negative tail x < -2 has the
  standard tanh-form *relative* error growth, but its *absolute* error
  stays below the bf16 quantization scale.

See tests/test_activations.py for the executable version of these claims.
The bf16 compute path therefore uses the tanh form (torch's
``approximate='tanh'``); float32/float64 keep the exact erf form, so
full-precision parity with the reference is unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU: exact erf form at f32/f64, tanh form at bf16 (see module doc)."""
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))
