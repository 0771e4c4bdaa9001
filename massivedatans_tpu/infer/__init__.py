"""Gradient-based per-dataset backends: batched HMC and mean-field VI.

New capability with no reference counterpart (the reference is
gradient-free): the model layer here is JAX-traced, so likelihood gradients
come for free, and D independent chains / variational fits batch into one
device program. Used to refine NS posteriors and to cross-check NS
evidences with an independent estimator family.
"""

from massivedatans_tpu.infer.hmc import run_hmc  # noqa: F401
from massivedatans_tpu.infer.vi import run_vi    # noqa: F401
