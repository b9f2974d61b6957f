from gptst_tpu.ops.capsule import dynamic_routing, squash
from gptst_tpu.ops.graph_conv import (
    adaptive_adj, cheb_conv, diffusion_conv, graph_matmul, mixprop,
    mtgnn_graph,
)
from gptst_tpu.ops.param_pool import node_param_linear, time_param_linear
from gptst_tpu.ops.temporal import (
    DilatedInception, GatedDilatedConv, TemporalConv, align_channels,
)

__all__ = [
    "dynamic_routing", "squash", "adaptive_adj", "cheb_conv",
    "diffusion_conv", "graph_matmul", "mixprop", "mtgnn_graph",
    "node_param_linear", "time_param_linear", "DilatedInception",
    "GatedDilatedConv", "TemporalConv", "align_channels",
]
