"""Enhancement wrapper: frozen GPT-ST encoder + gated fusion + predictor.

Counterpart of `model/Model.py`. In eval mode the pretrained encoder's
embedding is fused with a linear projection of the raw input through a
gated unit (`Fusion`, `Model.py:5-18`) and handed to the predictor at
`dim_in = hidden_dim`. Freezing is structural here: the pretrain params
live outside the trainable pytree (the optimizer never sees them),
which is the functional equivalent of `requires_grad=False`
(`Model.py:95-98`).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from gptst_tpu.models.gptst import GPTST, GPTSTConfig

# torch nn.Linear default init (reset_parameters): weight
# kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)); bias
# U(+-1/sqrt(fan_in)). The eval-mode head self-initializes in the lift
# protocol (STGCN confs set xavier=False, so `Run.py:79-85` never
# re-inits it) — match the reference's effective distribution so the
# two frameworks' eval runs start from the same law.
_torch_kernel = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                 "uniform")


def _torch_linear(feat: int, fan_in: int, name: str | None = None) -> nn.Dense:
    bound = float(fan_in) ** -0.5

    def bias_init(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -bound, bound)

    return nn.Dense(feat, kernel_init=_torch_kernel, bias_init=bias_init,
                    name=name)


class Fusion(nn.Module):
    """Gated fusion: z = sigmoid(W_s f + W_t t);
    H = W_o(z * f + (1-z) * t) (`Model.py:5-18`)."""

    dim: int

    @nn.compact
    def __call__(self, flow_eb, time_eb):
        xs = _torch_linear(self.dim, self.dim)(flow_eb)
        xt = _torch_linear(self.dim, self.dim)(time_eb)
        z = jax.nn.sigmoid(xs + xt)
        h = z * flow_eb + (1.0 - z) * time_eb
        return _torch_linear(self.dim, self.dim)(h)


class EnhanceHead(nn.Module):
    """Trainable glue in eval mode: input projection + fusion
    (`Model.py:43-44, 106-109`)."""

    hidden_dim: int
    input_base_dim: int

    @nn.compact
    def __call__(self, source, pretrain_eb):
        x_t1 = _torch_linear(self.hidden_dim, self.input_base_dim)(
            source[..., : self.input_base_dim])
        return Fusion(self.hidden_dim)(pretrain_eb, x_t1)


def build_enhance_apply(
    gptst_cfg: GPTSTConfig,
    pretrain_params: Any,
    predictor_apply: Callable[[Any, jnp.ndarray], jnp.ndarray],
):
    """Compose frozen encoder + head + predictor.

    Returns (init_fn, apply_fn):
      init_fn(rng, sample_source) -> {"head": ..., "predictor": <init by caller>}
      apply_fn(params, source) -> prediction
    where params = {"head": head_params, "predictor": predictor_params}.
    """
    gptst = GPTST(gptst_cfg)
    head = EnhanceHead(hidden_dim=gptst_cfg.hidden_dim,
                       input_base_dim=gptst_cfg.input_base_dim)

    def encode(source):
        emb = gptst.apply(pretrain_params, source, method=GPTST.encode)
        return jax.lax.stop_gradient(emb)

    def head_init(rng, sample_source):
        emb = encode(sample_source)
        return head.init(rng, sample_source, emb)

    def apply_fn(params, source, rng=None, y=None, step=None):
        emb = encode(source)
        fused = head.apply(params["head"], source, emb)
        return predictor_apply(params["predictor"], fused, rng, y=y, step=step)

    return head_init, apply_fn
