"""Per-layer rematerialization for stacked-layer scans.

Used by the LM transformer (models/lm/transformer.py) and the codec's
whisper-style stacks (models/codec/whisper_nn.py): wrap the scan body in
jax.checkpoint so the backward pass recomputes the layer instead of
keeping its intermediates alive across the whole stack. Training-only —
decode paths never differentiate. Values are unchanged (tested,
tests/test_train_scaling.py).
"""

from __future__ import annotations

import jax


def remat_layer(body, mode: str):
    """Wrap a scan body in jax.checkpoint for training memory.

    Modes:
    - "full": save nothing inside the layer (max memory win, recomputes
      every matmul on the backward pass);
    - "dots": save matmul outputs without batch dims (weight-dot results
      stay; attention scores / elementwise temporaries are recomputed) —
      the usual TPU sweet spot, since the MXU recompute is cheap relative
      to the HBM the saved activations would occupy.
    """
    if mode == "full":
        return jax.checkpoint(body)
    if mode == "dots":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    raise ValueError(f"remat mode {mode!r} not in ('full', 'dots')")
