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


def transplant_astgcn(params, ref):
    """Copy a reference ASTGCN's weights (`model/ASTGCN/ASTGCN.py`)
    into our flax param tree (mutates and returns `params`)."""

    def conv2d(conv):
        # torch (out, in, 1, kt) on (B,C,N,T) -> flax (kt, 1, in, out)
        w = conv.weight.detach().numpy()
        return {"kernel": w.transpose(3, 2, 1, 0),
                "bias": conv.bias.detach().numpy()}

    for i, blk in enumerate(ref.BlockList):
        tat, sat = blk.TAt, blk.SAt
        params[f"ASTGCNBlock_{i}"] = {
            "TemporalAttention_0": {
                "U1": tat.U1.detach().numpy(),
                "U2": tat.U2.detach().numpy(),
                "U3": tat.U3.detach().numpy(),
                "be": tat.be.detach().numpy(),
                "Ve": tat.Ve.detach().numpy()},
            "SpatialAttention_0": {
                "W1": sat.W1.detach().numpy(),
                "W2": sat.W2.detach().numpy(),
                "W3": sat.W3.detach().numpy(),
                "bs": sat.bs.detach().numpy(),
                "Vs": sat.Vs.detach().numpy()},
            "Theta": np.stack([t.detach().numpy()
                               for t in blk.cheb_conv_SAt.Theta]),
            "time_conv": conv2d(blk.time_conv),
            "residual_conv": conv2d(blk.residual_conv),
            "LayerNorm_0": {"scale": blk.ln.weight.detach().numpy(),
                            "bias": blk.ln.bias.detach().numpy()},
        }
    fw = ref.final_conv.weight.detach().numpy()   # (T_out*D, T, 1, F)
    params["final_w"] = fw[:, :, 0, :].transpose(1, 2, 0)
    params["final_b"] = ref.final_conv.bias.detach().numpy()
    return params


def lin(linear):
    """torch nn.Linear -> flax Dense params."""
    return {"kernel": linear.weight.detach().numpy().T,
            "bias": linear.bias.detach().numpy()}


def transplant_ccrnn(params, ref, khop):
    """Copy a reference EvoNN2's weights (`model/CCRNN_demand/CCRNN.py`)
    into our flax CCRNN param tree (mutates and returns `params`). The
    reference's diffusion features are (input, matrix)-major; ours are
    (matrix, input)-major, so linear weights permute on transplant."""
    num_m = khop + 1

    def gconv(linear):  # permute (i, m)-major cols -> (m, i)-major rows
        w = linear.weight.detach().numpy().T     # (I*M, out), i-major
        i_sz = w.shape[0] // num_m
        w = w.reshape(i_sz, num_m, -1).transpose(1, 0, 2) \
            .reshape(num_m * i_sz, -1)
        return {"kernel": w, "bias": linear.bias.detach().numpy()}

    def evo(ev):
        return {"gconv0": gconv(ev.graphconv[0].out),
                "attlinear": lin(ev.attlinear)}

    def cell(dc):
        return {"ru": evo(dc.ru_gate_g_conv),
                "cand": evo(dc.candidate_g_conv)}

    params["nodevec1"] = ref.nodevec1.detach().numpy()
    params["nodevec2"] = ref.nodevec2.detach().numpy()
    params["w1"] = ref.w1.detach().numpy()
    params["w2"] = ref.w2.detach().numpy()
    params["b1"] = ref.b1.detach().numpy()
    params["b2"] = ref.b2.detach().numpy()
    params["Scan_EncoderStep_0"] = {"cell0": cell(ref.encoder[0])}
    params["Scan_DecoderStep_0"] = {"cell0": cell(ref.decoder[0]),
                                    "out": lin(ref.decoder.out)}
    return params


def transplant_gptst(params, ref):
    """Copy a reference GPTST_Model's weights
    (`model/Pretrain_model/GPTST.py`) into our flax GPTST param tree
    (mutates and returns `params`, the "params" dict). Covers the full
    pretrain graph: encoder + decoder STHCN trunks, in/out projections,
    mask-policy MLP and the mask embeddings — the map the parity suites
    (`test_parity_gptst.py`) verify component-by-component. Used by the
    lift experiment's encoder-transplant bisection arm."""

    def _tf(tf):
        return {"Dense_0": lin(tf.ln_day), "Dense_1": lin(tf.ln_week),
                "Dense_2": lin(tf.ln1), "Dense_3": lin(tf.ln2),
                "Dense_4": lin(tf.ln)}

    def _hypertem(ht):
        return {"adj": ht.adj.detach().numpy(),
                "weights_pool": ht.weights_pool.detach().numpy(),
                "bias_pool": ht.bias_pool.detach().numpy()}

    def _cap(cp):
        return {"Dense_0": lin(cp.ln_p),
                "t_adj": cp.t_adj.detach().numpy(),
                "adj": cp.adj.detach().numpy(),
                "weights_spa": cp.weights_spa.detach().numpy(),
                "bias_spa": cp.bias_spa.detach().numpy()}

    def _sthcn(st):
        return {
            "node_embeddings": st.node_embeddings.detach().numpy(),
            "node_embeddings_spg": st.node_embeddings_spg.detach().numpy(),
            "TimeFeature_0": _tf(st.time_feature1),
            "TimeFeature_1": _tf(st.time_feature1_),
            "TimeFeatureSPG_0": _tf(st.time_feature2),
            "HyperTem_0": _hypertem(st.hyperTem1),
            "HyperTem_1": _hypertem(st.hyperTem2),
            "HyperTem_2": _hypertem(st.hyperTem3),
            "HyperTem_3": _hypertem(st.hyperTem4),
            "Cap_0": _cap(st.cap1),
            "Cap_1": _cap(st.cap2),
        }

    params["dim_in_flow"] = lin(ref.encoder.dim_in_flow)
    params["encoder"] = _sthcn(ref.encoder.STHCN_encode)
    params["decoder"] = _sthcn(ref.decoder.STHCN_decode)
    params["dim_flow_out"] = lin(ref.decoder.dim_flow_out)
    rl = ref.encoder.MLP_RL
    params["mlp_rl"] = {
        "Dense_0": lin(rl.ln1), "Dense_1": lin(rl.ln3),
        "weights_pool_spa": rl.weights_pool_spa.detach().numpy(),
        "bias_pool_spa": rl.bias_pool_spa.detach().numpy(),
        "weights_pool_tem": rl.weights_pool_tem.detach().numpy(),
        "bias_pool_tem": rl.bias_pool_tem.detach().numpy()}
    params["teb4mask"] = _tf(ref.encoder.teb4mask)
    params["neb4mask"] = ref.encoder.neb4mask.detach().numpy()
    return params


def as_numpy_tree(params):
    import jax

    return jax.tree.map(np.asarray, params)
