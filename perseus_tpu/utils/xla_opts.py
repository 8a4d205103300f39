"""Per-compile XLA:TPU option plumbing.

The axon tunnel scrubs ``XLA_FLAGS`` on the compile helper and the CLIENT
jaxlib (CPU) rejects TPU-only flag names outright, so the only way to
reach TPU backend options from this environment is the proto-backed
``compiler_options`` argument of ``jax.jit`` — which the tunnel forwards
per-compile. This module centralizes that:

  * ``PERSEUS_COMPILER_OPTIONS="k=v,k2=v2"`` (env) applies extra options to
    every train/bench step jit, for on-chip sweeps without code edits.
  * ``TPU_DEFAULTS`` holds measured-good defaults applied on the TPU
    backend only (CPU/interpreter compiles would reject the names).

Measured so far (fwdbwd step, b=256, v5e): raising the scoped-VMEM limit
16 MB -> 64 MB cuts the XLA cost model's total estimated cycles by 11.4%
(conv1 filter-grad fusion -21%) by letting the conv emitters pick larger
windows. See ROUND5_RESULTS.md for the wall-clock measurement.
"""

from __future__ import annotations

import os

import jax

# applied on TPU only, merged under any env-provided options. Candidates
# enter here ONLY after a wall-clock win on-chip (cost-model deltas alone
# don't qualify — round 5 measured two cost-model-positive changes that
# regressed wall-clock).
TPU_DEFAULTS: dict[str, str] = {}


def tpu_compiler_options() -> dict[str, str] | None:
    """Options for ``jax.jit(compiler_options=...)`` — TPU defaults merged
    with ``PERSEUS_COMPILER_OPTIONS`` overrides; None off-TPU (option names
    are backend-specific and the CPU compiler rejects them)."""
    if jax.default_backend() != "tpu":
        return None
    opts = dict(TPU_DEFAULTS)
    env = os.environ.get("PERSEUS_COMPILER_OPTIONS", "")
    for item in env.replace(",", " ").split():
        if "=" in item:
            k, v = item.split("=", 1)
            if v == "":
                opts.pop(k, None)  # "k=" removes a default
            else:
                opts[k] = v
    return opts or None
