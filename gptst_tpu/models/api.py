"""Model API: the typed replacement for the reference's 5-tuple contract.

Every top-level reference model returns `(out, out_time, mask,
probability, eb)` (`model/BasicTrainer.py:82,90`); predictors fake the
tuple by repeating the prediction (`model/Model.py:117,127`). Here the
contract is an explicit struct; fields beyond `pred` are None except in
pretrain mode.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax.numpy as jnp


class ModelOutput(NamedTuple):
    pred: jnp.ndarray                       # (B, T_out, N, D_out)
    out_time: Optional[jnp.ndarray] = None  # decoder hidden (pretrain)
    mask: Optional[jnp.ndarray] = None      # 1 on masked-out points (pretrain)
    probability: Optional[jnp.ndarray] = None  # mask-policy softmax (pretrain)
    routing: Optional[jnp.ndarray] = None   # capsule assignment HS_cat (pretrain)


# A forward function: (params, x, y, rng, epoch, step) -> ModelOutput.
# `y` is the label (used only by teacher-forcing predictors), `rng` a
# PRNG key (mask sampling / dropout / scheduled sampling), `epoch`
# drives the mask curriculum, `step` is the global batches-seen counter
# (CCRNN's scheduled-sampling threshold, `model/CCRNN_demand/CCRNN.py:194`).
ForwardFn = Callable[..., ModelOutput]
