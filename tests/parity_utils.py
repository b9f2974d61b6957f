"""Shared torch->JAX weight-transplant helpers for the parity suites."""

import numpy as np


def set_conv(dst, conv):
    """torch Conv2d (out,in,kh,kw) -> flax (kh,kw,in,out)."""
    dst["kernel"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    dst["bias"] = conv.bias.detach().numpy()


def set_dense_from_conv1x1(dst, conv):
    dst["kernel"] = conv.weight.detach().numpy()[:, :, 0, 0].T
    dst["bias"] = conv.bias.detach().numpy()


def transplant_stgcn(p, ref):
    """Copy a reference STGCN's weights (`model/STGCN/stgcn.py`) into
    our flax param tree (mutates and returns `p`, the "params" dict)."""

    def map_tconv(dst, src):
        set_conv(dst["Conv_0"], src.conv)
        if hasattr(src.align, "conv1x1"):
            set_dense_from_conv1x1(dst["Dense_0"], src.align.conv1x1)

    def map_block(dst, src):
        map_tconv(dst["TemporalConv_0"], src.tconv1)
        map_tconv(dst["TemporalConv_1"], src.tconv2)
        sc, sd = dst["SpatioConvLayer_0"], src.sconv
        sc["theta"] = sd.theta.detach().numpy()
        sc["bias"] = sd.b.detach().numpy().reshape(-1)
        if "Dense_0" in sc:
            set_dense_from_conv1x1(sc["Dense_0"], sd.align.conv1x1)
        ln, lnr = dst["LayerNorm_0"], src.ln
        ln["scale"] = lnr.weight.detach().numpy()
        ln["bias"] = lnr.bias.detach().numpy()

    map_block(p["STConvBlock_0"], ref.st_conv1)
    map_block(p["STConvBlock_1"], ref.st_conv2)
    out_p, out_r = p["OutputLayer_0"], ref.output
    map_tconv(out_p["TemporalConv_0"], out_r.tconv1)
    ln, lnr = out_p["LayerNorm_0"], out_r.ln
    ln["scale"] = lnr.weight.detach().numpy()
    ln["bias"] = lnr.bias.detach().numpy()
    map_tconv(out_p["TemporalConv_1"], out_r.tconv2)
    set_dense_from_conv1x1(out_p["Dense_0"], out_r.fc.conv)
    return p


def as_numpy_tree(params):
    import jax

    return jax.tree.map(np.asarray, params)
