"""Distributed CTC training for VGSL conv stacks — the lstmtraining
analogue (src/training/lstmtraining.cpp; LSTMTrainer::TrainOnLine
src/training/unicharset/lstmtrainer.cpp:266-310).

Re-expresses the reference's single-process trainer as the idiomatic
Spark iterative-aggregation pattern (the MLlib design): per-partition
gradient sums computed inside ONE mapInPandas over Arrow batches of
training lines, one model-sized partial row per partition, a driver-side
Adam step (WeightMatrix::Update, src/lstm/weightmatrix.cpp:280-330 —
the reference's adam_beta/momentum update), and a re-broadcast of the
updated weights each iteration.  Data never moves; only O(model) bytes
per partition per step do.  At cluster scale the partial rows would be
combined with treeReduce (log-depth); in local mode a driver sum over
the handful of partition rows is identical.

Loss is real CTC (Graves forward-backward in log space).  Divergence
note vs the reference: src/lstm/ctc.cpp ComputeCTCTargets normalizes
the label-alignment targets heuristically (truncated alpha-beta with
re-normalized spikes); we implement the standard full forward-backward
whose targets the reference's method approximates.

Backward covers every VGSL layer kind the forward implements: conv
(tanh/relu), maxpool, collapse-height, LSTM over x (forward / reversed
/ bidirectional, full BPTT — lstm.cpp:291 Backward's gate-delta walk),
output softmax, and the y-summarizing LSTM (Lfys/Lrys: LSTM over the
height axis keeping the last step, gradient injected at that step
only — the feature-extractor layer of the reference's shipped specs,
lstm_squashed_test.cc).
"""

from __future__ import annotations

import numpy as np

from .vgsl import Layer, VGSLNetwork

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# CTC loss + gradient (Graves forward-backward, log space)
# ---------------------------------------------------------------------------


def ctc_loss_grad(
    logp: np.ndarray, labels: list[int], blank: int
) -> tuple[float, np.ndarray]:
    """CTC negative log-likelihood and gradient w.r.t. the LOGITS.

    ``logp``: [T, C] log-softmax outputs for one line (real width only).
    Returns (loss, dlogits [T, C]) with dlogits = softmax - posteriors
    (the standard identity; lstmtrainer.cpp feeds deltas = output -
    target into Network::Backward the same way).
    """
    T, C = logp.shape
    L = len(labels)
    ext = np.empty(2 * L + 1, dtype=np.int64)
    ext[0::2] = blank
    ext[1::2] = labels
    S = len(ext)
    if T < L:  # line too short to emit the labels at all
        return float(-NEG_INF), np.zeros_like(logp)

    lp = logp.astype(np.float64)
    # can s-2 -> s skip the blank? (different consecutive labels)
    skip = np.zeros(S, dtype=bool)
    skip[3::2] = ext[3::2] != ext[1:-2:2]

    alpha = np.full((T, S), NEG_INF)
    alpha[0, 0] = lp[0, ext[0]]
    if S > 1:
        alpha[0, 1] = lp[0, ext[1]]
    for t in range(1, T):
        prev = alpha[t - 1]
        stay = prev
        step = np.concatenate(([NEG_INF], prev[:-1]))
        jump = np.concatenate(([NEG_INF, NEG_INF], prev[:-2]))
        jump = np.where(skip, jump, NEG_INF)
        m = np.maximum(np.maximum(stay, step), jump)
        m_safe = np.where(m <= NEG_INF, 0.0, m)
        tot = (
            np.exp(stay - m_safe)
            + np.exp(step - m_safe)
            + np.exp(jump - m_safe)
        )
        alpha[t] = np.where(
            m <= NEG_INF, NEG_INF, m_safe + np.log(np.maximum(tot, 1e-300))
        ) + lp[t, ext]

    end1 = float(alpha[T - 1, S - 1])
    end2 = float(alpha[T - 1, S - 2]) if S > 1 else NEG_INF
    m = max(end1, end2)
    if m <= NEG_INF:
        return float(-NEG_INF), np.zeros_like(logp)
    log_z = m + np.log(np.exp(end1 - m) + np.exp(end2 - m))
    loss = -float(log_z)

    beta = np.full((T, S), NEG_INF)
    beta[T - 1, S - 1] = lp[T - 1, ext[S - 1]]
    if S > 1:
        beta[T - 1, S - 2] = lp[T - 1, ext[S - 2]]
    skip_f = np.zeros(S, dtype=bool)  # forward skip viewed from s: s -> s+2
    skip_f[:-2] = skip[2:]
    for t in range(T - 2, -1, -1):
        nxt = beta[t + 1]
        stay = nxt
        step = np.concatenate((nxt[1:], [NEG_INF]))
        jump = np.concatenate((nxt[2:], [NEG_INF, NEG_INF]))
        jump = np.where(skip_f, jump, NEG_INF)
        m2 = np.maximum(np.maximum(stay, step), jump)
        m2_safe = np.where(m2 <= NEG_INF, 0.0, m2)
        tot = (
            np.exp(stay - m2_safe)
            + np.exp(step - m2_safe)
            + np.exp(jump - m2_safe)
        )
        beta[t] = np.where(
            m2 <= NEG_INF, NEG_INF, m2_safe + np.log(np.maximum(tot, 1e-300))
        ) + lp[t, ext]

    # posterior gamma[t, s] = alpha*beta / (p(t, ext[s]) * Z)
    post = alpha + beta - lp[:, ext] - log_z
    gamma = np.exp(np.clip(post, -700, 0))
    G = np.zeros((T, C))
    np.add.at(G, (np.arange(T)[:, None], ext[None, :].repeat(T, 0)), gamma)
    dlogits = (np.exp(lp) - G).astype(np.float32)
    return loss, dlogits


# ---------------------------------------------------------------------------
# forward with cache + backward through the conv stack
# ---------------------------------------------------------------------------


def forward_cache(
    net: VGSLNetwork, x: np.ndarray
) -> tuple[np.ndarray, list[dict]]:
    """net.forward with per-layer activation caches for backward."""
    from .vgsl import _collapse_height

    out_layer = net.layers[-1]
    assert out_layer.kind == "output", out_layer.kind
    x, caches = _stack_forward_cache(net.layers[:-1], x)
    seq = _collapse_height(x)[:, 0]  # [N, W, D]
    w, b = out_layer.weights["w"], out_layer.weights["b"]
    logits = seq @ w.T + b
    mx = logits.max(-1, keepdims=True)
    e = np.exp(logits - mx)
    logp = (logits - mx) - np.log(e.sum(-1, keepdims=True))
    caches.append({"seq": seq, "in_shape": x.shape})
    return logp, caches


def _stack_forward_cache(
    layers: list, x: np.ndarray
) -> tuple[np.ndarray, list[dict]]:
    """Forward a (sub-)stack of non-output layers with caches — shared by
    forward_cache and the parallel/reversed branch walks."""
    from .vgsl import _collapse_height, _conv, _maxpool

    caches: list[dict] = []
    for layer in layers:
        if layer.kind == "conv":
            out = _conv(x, layer)
            caches.append({"x": x, "a": out})
            x = out
        elif layer.kind == "maxpool":
            out = _maxpool(x, layer)
            caches.append({"x": x, "a": out})
            x = out
        elif layer.kind == "reconfig":
            from .vgsl import _reconfig

            out = _reconfig(x, layer)
            caches.append({"in_shape": x.shape})
            x = out
        elif layer.kind == "fc":
            from .vgsl import _fc

            out = _fc(x, layer)
            caches.append({
                "in_shape": x.shape,
                "seq": _collapse_height(x)[:, 0],
                "a": out[:, 0],
            })
            x = out
        elif layer.kind == "lstm_2d_quad":
            from .vgsl import _QUAD_FLIPS, _lstm_2d_dir

            dir_caches = []
            outs = []
            for d, (fx, fy) in enumerate(_QUAD_FLIPS):
                xi = x[:, ::-1] if fy else x
                xi = np.ascontiguousarray(xi[:, :, ::-1] if fx else xi)
                o, c = _lstm_2d_dir(
                    xi, layer.weights, f"d{d}_", want_cache=True)
                dir_caches.append(c)
                o = o[:, :, ::-1] if fx else o
                o = o[:, ::-1] if fy else o
                outs.append(o)
            caches.append({"in_shape": x.shape, "dirs": dir_caches})
            # match the inference path's dtype (float32 pipeline)
            x = np.concatenate(outs, axis=-1).astype(np.float32)
        elif layer.kind == "lstm_y_summary":
            n, h, w, d = x.shape
            seq = x.transpose(0, 2, 1, 3).reshape(n * w, h, d)
            rev = bool(layer.params.get("reverse"))
            s_in = seq[:, ::-1] if rev else seq
            h_all, f_cache = _lstm_dir_cache(s_in, layer.weights, "")
            caches.append({"in_shape": x.shape, "f": f_cache})
            x = h_all[:, -1].reshape(n, w, -1)[:, None, :, :]
        elif layer.kind == "lstm_x":
            xc = _collapse_height(x)
            seq = xc[:, 0]  # [N, W, D]
            cache: dict = {"in_shape": x.shape, "seq": seq}
            rev = bool(layer.params.get("reverse"))
            s_in = seq[:, ::-1] if rev else seq
            f_out, f_cache = _lstm_dir_cache(s_in, layer.weights, "")
            out2 = f_out[:, ::-1] if rev else f_out
            cache["f"] = f_cache
            if layer.params["bidi"]:
                b_out, b_cache = _lstm_dir_cache(
                    seq[:, ::-1], layer.weights, "r_"
                )
                out2 = np.concatenate([out2, b_out[:, ::-1]], axis=-1)
                cache["b"] = b_cache
            caches.append(cache)
            x = out2[:, None, :, :]
        elif layer.kind == "parallel":
            # Parallel::Forward/Backward (parallel.cpp): branches share
            # the input; outputs pack depth-wise, input deltas SUM.
            bcaches, outs = [], []
            for br in layer.params["branches"]:
                o, c = _stack_forward_cache(br, x)
                bcaches.append(c)
                outs.append(o)
            caches.append({
                "branch_caches": bcaches,
                "branch_depths": [o.shape[-1] for o in outs],
            })
            x = np.concatenate(outs, axis=-1).astype(np.float32)
        elif layer.kind == "reversed":
            ax = 1 if layer.params["axis"] == "y" else 2
            xi = np.ascontiguousarray(np.flip(x, axis=ax))
            o, c = _stack_forward_cache(layer.params["branches"][0], xi)
            caches.append({"branch_caches": [c], "axis": ax})
            x = np.ascontiguousarray(np.flip(o, axis=ax))
        else:
            raise ValueError(
                f"training backward not implemented for layer kind "
                f"{layer.kind!r}"
            )
    return x, caches


def backward(
    net: VGSLNetwork,
    caches: list[dict],
    dlogits: np.ndarray,
) -> dict[int, dict[str, np.ndarray]]:
    """Gradients for every layer's weights given dL/dlogits [N, W, C].

    Mirrors Network::Backward's reverse walk
    (src/lstm/network.cpp / series.cpp:175-205)."""
    grads: dict[int, dict[str, np.ndarray]] = {}
    li = len(net.layers) - 1
    layer = net.layers[li]
    assert layer.kind == "output"
    cache = caches[li]
    seq = cache["seq"]  # [N, W, D]
    n, w_len, d = seq.shape
    dl2 = dlogits.reshape(n * w_len, -1)
    grads[li] = {
        "w": (dl2.T @ seq.reshape(n * w_len, d)).astype(np.float32),
        "b": dl2.sum(0).astype(np.float32),
    }
    dseq = (dl2 @ layer.weights["w"]).reshape(n, w_len, d)
    # invert the height collapse back to [N, H, W, D]
    ns, hs, ws, ds = cache["in_shape"]
    if hs == 1:
        dx = dseq[:, None, :, :]
    else:
        dx = dseq.reshape(ns, ws, hs, ds).transpose(0, 2, 1, 3)

    _dx, body_grads = _stack_backward(net.layers[:-1], caches[:-1], dx)
    grads.update(body_grads)
    return grads


def _stack_backward(
    layers: list, caches: list[dict], dx: np.ndarray
) -> tuple[np.ndarray, dict]:
    """Reverse walk over a (sub-)stack of non-output layers; returns the
    input delta and {stack_idx: {weight_key: grad}} with composite keys
    ('<branch>:<sub>:<key>') for weights inside parallel/reversed groups."""
    grads: dict[int, dict[str, np.ndarray]] = {}
    for li in range(len(layers) - 1, -1, -1):
        layer = layers[li]
        cache = caches[li]
        if layer.kind == "maxpool":
            dx = _maxpool_backward(cache["x"], cache["a"], dx, layer)
        elif layer.kind == "conv":
            dx, gw, gb = _conv_backward(cache["x"], cache["a"], dx, layer)
            grads[li] = {"w": gw, "b": gb}
        elif layer.kind == "lstm_x":
            dx, g = _lstm_x_backward(layer, cache, dx)
            grads[li] = g
        elif layer.kind == "lstm_y_summary":
            dx, g = _lstm_y_summary_backward(layer, cache, dx)
            grads[li] = g
        elif layer.kind == "parallel":
            g: dict[str, np.ndarray] = {}
            dx_in = None
            off = 0
            for bi, (br, bc) in enumerate(zip(
                    layer.params["branches"], cache["branch_caches"])):
                d_out = cache["branch_depths"][bi]
                dxb = np.ascontiguousarray(dx[..., off:off + d_out])
                off += d_out
                dxi, gsub = _stack_backward(br, bc, dxb)
                for si, gw2 in gsub.items():
                    for k, v in gw2.items():
                        g[f"{bi}:{si}:{k}"] = v
                dx_in = dxi if dx_in is None else dx_in + dxi
            grads[li] = g
            dx = dx_in
        elif layer.kind == "reversed":
            ax = cache["axis"]
            dxo = np.ascontiguousarray(np.flip(dx, axis=ax))
            dxi, gsub = _stack_backward(
                layer.params["branches"][0], cache["branch_caches"][0], dxo)
            grads[li] = {
                f"0:{si}:{k}": v
                for si, gw2 in gsub.items() for k, v in gw2.items()
            }
            dx = np.ascontiguousarray(np.flip(dxi, axis=ax))
        elif layer.kind == "reconfig":
            ns_, hs, ws, ds = cache["in_shape"]
            ky, kx = layer.params["ky"], layer.params["kx"]
            h2, w2 = hs // ky, ws // kx
            # inverse of the X-MAJOR tile stack (kx outermost)
            dxr = dx.reshape(ns_, h2, w2, kx, ky, ds)
            dxp = np.zeros((ns_, hs, ws, ds), dtype=np.float32)
            dxp[:, : h2 * ky, : w2 * kx] = dxr.transpose(
                0, 1, 4, 2, 3, 5).reshape(ns_, h2 * ky, w2 * kx, ds)
            dx = dxp
        elif layer.kind == "lstm_2d_quad":
            dx, g = _lstm_2d_quad_backward(layer, cache, dx)
            grads[li] = g
        elif layer.kind == "fc":
            a = cache["a"].astype(np.float64)  # [N, W, n_out]
            dz = dx[:, 0].astype(np.float64)
            act = layer.params["act"]
            if act == "s":
                dz = dz * a * (1.0 - a)
            elif act == "t":
                dz = dz * (1.0 - a * a)
            elif act == "r":
                dz = dz * (a > 0)
            seq = cache["seq"]  # [N, W, H*D]
            n2, w2, dd = seq.shape
            dz2 = dz.reshape(n2 * w2, -1)
            grads[li] = {
                "w": (dz2.T @ seq.reshape(n2 * w2, dd)).astype(np.float32),
                "b": dz2.sum(0).astype(np.float32),
            }
            dseq = (dz2 @ layer.weights["w"]).reshape(n2, w2, dd)
            ns_, hs, ws, ds = cache["in_shape"]
            if hs == 1:
                dx = dseq[:, None, :, :].astype(np.float32)
            else:
                dx = dseq.reshape(ns_, ws, hs, ds).transpose(
                    0, 2, 1, 3).astype(np.float32)
        else:  # pragma: no cover - forward_cache already rejected it
            raise ValueError(f"no backward for {layer.kind!r}")
    return dx, grads


def _lstm_dir_cache(
    seq: np.ndarray, wts: dict, prefix: str
) -> tuple[np.ndarray, dict]:
    """vgsl._lstm_dir with per-step gate/state caches for BPTT."""
    from .vgsl import _sigmoid

    wx, wh, b = wts[prefix + "wx"], wts[prefix + "wh"], wts[prefix + "b"]
    n, t, d = seq.shape
    units = wh.shape[1]
    gates_x = (seq.reshape(n * t, d) @ wx.T).reshape(n, t, 4 * units) + b
    h = np.zeros((n, units), dtype=np.float32)
    c = np.zeros((n, units), dtype=np.float32)
    i_a = np.empty((n, t, units), np.float32)
    f_a = np.empty_like(i_a)
    o_a = np.empty_like(i_a)
    u_a = np.empty_like(i_a)
    c_a = np.empty_like(i_a)
    h_a = np.empty_like(i_a)
    for step in range(t):
        g = gates_x[:, step] + h @ wh.T
        i = _sigmoid(g[:, :units])
        f = _sigmoid(g[:, units : 2 * units])
        o = _sigmoid(g[:, 2 * units : 3 * units])
        u = np.tanh(g[:, 3 * units :])
        c = f * c + i * u
        h = o * np.tanh(c)
        i_a[:, step], f_a[:, step], o_a[:, step] = i, f, o
        u_a[:, step], c_a[:, step], h_a[:, step] = u, c, h
    return h_a, {"i": i_a, "f": f_a, "o": o_a, "u": u_a, "c": c_a,
                 "h": h_a, "seq": seq}


def _lstm_bptt(
    wts: dict, prefix: str, cache: dict, dout: np.ndarray
) -> tuple[np.ndarray, dict]:
    """Gate-delta backward walk of one LSTM direction
    (LSTM::Backward, src/lstm/lstm.cpp:459-560 semantics, no peepholes).
    Returns (dseq, {wx,wh,b} grads)."""
    wx, wh = wts[prefix + "wx"], wts[prefix + "wh"]
    i_a, f_a, o_a, u_a, c_a, h_a, seq = (
        cache["i"], cache["f"], cache["o"], cache["u"], cache["c"],
        cache["h"], cache["seq"],
    )
    n, t, units = i_a.shape
    tc = np.tanh(c_a)
    dgates = np.empty((n, t, 4 * units), np.float64)
    dh_next = np.zeros((n, units), np.float64)
    dc_next = np.zeros((n, units), np.float64)
    for step in range(t - 1, -1, -1):
        i, f, o, u = i_a[:, step], f_a[:, step], o_a[:, step], u_a[:, step]
        dh = dout[:, step] + dh_next
        do = dh * tc[:, step]
        dc = dh * o * (1.0 - tc[:, step] ** 2) + dc_next
        di = dc * u
        du = dc * i
        c_prev = c_a[:, step - 1] if step > 0 else 0.0
        df = dc * c_prev
        dc_next = dc * f
        dg = np.concatenate(
            [di * i * (1 - i), df * f * (1 - f), do * o * (1 - o),
             du * (1 - u * u)],
            axis=1,
        )
        dgates[:, step] = dg
        dh_next = dg @ wh
    h_prev = np.concatenate(
        [np.zeros((n, 1, units), np.float32), h_a[:, :-1]], axis=1
    )
    dg2 = dgates.reshape(n * t, 4 * units)
    g = {
        prefix + "wx": (dg2.T @ seq.reshape(n * t, -1)).astype(np.float32),
        prefix + "wh": (dg2.T @ h_prev.reshape(n * t, units)).astype(
            np.float32
        ),
        prefix + "b": dg2.sum(0).astype(np.float32),
    }
    dseq = (dg2 @ wx).reshape(n, t, -1)
    return dseq, g


def _lstm_2d_quad_backward(
    layer: Layer, cache: dict, dx: np.ndarray
) -> tuple[np.ndarray, dict]:
    """BPTT for the 2-D LSTM quad: each direction back-propagates on its
    flipped frame, gradients un-flip and sum into the input delta."""
    from .vgsl import _QUAD_FLIPS

    units = layer.params["units"]
    dxp = np.zeros(cache["in_shape"], dtype=np.float64)
    grads: dict[str, np.ndarray] = {}
    for d, (fx, fy) in enumerate(_QUAD_FLIPS):
        dout = dx[..., d * units:(d + 1) * units].astype(np.float64)
        dout = dout[:, ::-1] if fy else dout
        dout = np.ascontiguousarray(dout[:, :, ::-1] if fx else dout)
        dxi, g = _lstm_2d_bptt(
            layer.weights, f"d{d}_", cache["dirs"][d], dout)
        dxi = dxi[:, :, ::-1] if fx else dxi
        dxi = dxi[:, ::-1] if fy else dxi
        dxp += dxi
        grads.update(g)
    return dxp.astype(np.float32), grads


def _lstm_2d_bptt(
    wts: dict, prefix: str, cache: dict, dout: np.ndarray
) -> tuple[np.ndarray, dict]:
    """Gate-delta walk of one 2-D direction (lstm.cpp Backward Is2D):
    state error flows to the x-predecessor where the max-pooled forget
    chose GF1 and to the y-predecessor where it chose GFS; output error
    gathers the h-recurrence terms from both successors.  Error clips
    follow the reference (state +-9, gates +-1, lstm.cpp:73,608)."""
    wx = wts[prefix + "wx"]
    whx = wts[prefix + "whx"]
    why = wts[prefix + "why"]
    ci_a, gi_a = cache["ci"], cache["gi"]
    gf1_a, gfs_a, go_a = cache["gf1"], cache["gfs"], cache["go"]
    st_a, fg2_a, x = cache["state"], cache["fg2"], cache["x"]
    n, h, w, units = ci_a.shape
    d_in = x.shape[-1]
    tanh_st = np.tanh(st_a)
    E = np.empty((n, h, w, 5 * units), np.float64)
    dx_out = np.empty((n, h, w, d_in), np.float64)
    # y-successor buffers (per x position): state error and dh_y
    se_buf = np.zeros((n, w, units), np.float64)
    dhy_buf = np.zeros((n, w, units), np.float64)
    for y in range(h - 1, -1, -1):
        carry_se = np.zeros((n, units), np.float64)
        carry_dhx = np.zeros((n, units), np.float64)
        for xx in range(w - 1, -1, -1):
            outputerr = dout[:, y, xx] + carry_dhx + dhy_buf[:, xx]
            se = np.zeros((n, units), np.float64)
            if xx + 1 < w:
                keep = ~fg2_a[:, y, xx + 1]
                se += carry_se * gf1_a[:, y, xx + 1] * keep
            if y + 1 < h:
                se += se_buf[:, xx] * gfs_a[:, y + 1, xx] * fg2_a[:, y + 1, xx]
            ts = tanh_st[:, y, xx]
            se = se + outputerr * go_a[:, y, xx] * (1.0 - ts * ts)
            se = np.clip(se, -9.0, 9.0)
            ci, gi = ci_a[:, y, xx], gi_a[:, y, xx]
            gf1, gfs, go = gf1_a[:, y, xx], gfs_a[:, y, xx], go_a[:, y, xx]
            st_px = st_a[:, y, xx - 1] if xx > 0 else 0.0
            st_py = st_a[:, y - 1, xx] if y > 0 else 0.0
            # The max-pool forget selection routes each unit's state
            # through EXACTLY one forget gate, so the true gate errors
            # are masked by that choice (the reference computes both
            # unmasked — lstm.cpp:657-684 — accepting the approximate
            # gradient; the masked form is the exact one).
            fg2 = fg2_a[:, y, xx]
            e = np.concatenate([
                np.clip(se * gi * (1.0 - ci * ci), -1.0, 1.0),
                np.clip(se * ci * gi * (1.0 - gi), -1.0, 1.0),
                np.clip(se * st_px * gf1 * (1.0 - gf1) * ~fg2, -1.0, 1.0)
                if xx > 0 else np.zeros((n, units)),
                np.clip(se * st_py * gfs * (1.0 - gfs) * fg2, -1.0, 1.0)
                if y > 0 else np.zeros((n, units)),
                np.clip(outputerr * ts * go * (1.0 - go), -1.0, 1.0),
            ], axis=1)
            E[:, y, xx] = e
            dx_out[:, y, xx] = e @ wx
            carry_dhx = e @ whx
            dhy_buf[:, xx] = e @ why
            carry_se = se
            se_buf[:, xx] = se
    # weight gradients: one big outer product over all steps
    h_prev_x = np.zeros((n, h, w, units), np.float64)
    h_prev_x[:, :, 1:] = tanh_st[:, :, :-1] * go_a[:, :, :-1]
    h_prev_y = np.zeros((n, h, w, units), np.float64)
    h_prev_y[:, 1:] = tanh_st[:, :-1] * go_a[:, :-1]
    src = np.concatenate(
        [x.astype(np.float64), h_prev_x, h_prev_y], axis=-1)
    E2 = E.reshape(-1, 5 * units)
    G = E2.T @ src.reshape(-1, d_in + 2 * units)
    g = {
        prefix + "wx": G[:, :d_in].astype(np.float32),
        prefix + "whx": G[:, d_in:d_in + units].astype(np.float32),
        prefix + "why": G[:, d_in + units:].astype(np.float32),
        prefix + "b": E2.sum(0).astype(np.float32),
    }
    return dx_out, g


def _lstm_y_summary_backward(
    layer: Layer, cache: dict, dx: np.ndarray
) -> tuple[np.ndarray, dict]:
    """BPTT for Lfys/Lrys: upstream gradient lands only on the LAST
    y-step (the one the summary keeps); earlier steps receive it via
    the recurrent chain inside _lstm_bptt."""
    ns, hs, ws, ds = cache["in_shape"]
    units = layer.params["units"]
    dout_last = dx[:, 0].astype(np.float64).reshape(ns * ws, units)
    dout = np.zeros((ns * ws, hs, units), np.float64)
    dout[:, -1] = dout_last
    dseq, g = _lstm_bptt(layer.weights, "", cache["f"], dout)
    if layer.params.get("reverse"):
        dseq = dseq[:, ::-1]
    dxp = dseq.reshape(ns, ws, hs, ds).transpose(0, 2, 1, 3)
    return dxp.astype(np.float32), g


def _lstm_x_backward(
    layer: Layer, cache: dict, dx: np.ndarray
) -> tuple[np.ndarray, dict]:
    dout = dx[:, 0].astype(np.float64)  # [N, W, U or 2U]
    units = layer.params["units"]
    rev = bool(layer.params.get("reverse"))
    d_f = dout[:, :, :units]
    dseq_f, g = _lstm_bptt(
        layer.weights, "", cache["f"], d_f[:, ::-1] if rev else d_f
    )
    dseq = dseq_f[:, ::-1] if rev else dseq_f
    if layer.params["bidi"]:
        d_b = dout[:, :, units:]
        dseq_b, gb = _lstm_bptt(layer.weights, "r_", cache["b"], d_b[:, ::-1])
        dseq = dseq + dseq_b[:, ::-1]
        g.update(gb)
    ns, hs, ws, ds = cache["in_shape"]
    if hs == 1:
        dxp = dseq[:, None, :, :]
    else:
        dxp = dseq.reshape(ns, ws, hs, ds).transpose(0, 2, 1, 3)
    return dxp.astype(np.float32), g


def _conv_backward(
    x: np.ndarray, a: np.ndarray, dout: np.ndarray, layer: Layer
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    n, h, w, d = x.shape
    ky, kx = layer.params["ky"], layer.params["kx"]
    py, px = ky // 2, kx // 2
    if layer.params["act"] == "tanh":
        dz = dout * (1.0 - a * a)
    else:
        dz = dout * (a > 0)
    dz2 = dz.reshape(n * h * w, -1)
    # recompute im2col (memory-light: cache holds only x and a)
    xp = np.pad(x, ((0, 0), (py, ky - 1 - py), (px, kx - 1 - px), (0, 0)))
    win = np.lib.stride_tricks.sliding_window_view(xp, (ky, kx), axis=(1, 2))
    cols = win.transpose(0, 1, 2, 4, 5, 3).reshape(n * h * w, ky * kx * d)
    gw = (dz2.T @ cols).astype(np.float32)
    gb = dz2.sum(0).astype(np.float32)
    # scatter dcols back through the sliding windows
    wr = layer.weights["w"].reshape(-1, ky, kx, d)  # [F, ky, kx, D]
    dxp = np.zeros_like(xp)
    for iy in range(ky):
        for ix in range(kx):
            dxp[:, iy : iy + h, ix : ix + w, :] += np.einsum(
                "nhwf,fd->nhwd", dz, wr[:, iy, ix, :], optimize=True
            )
    return dxp[:, py : py + h, px : px + w, :], gw, gb


def _maxpool_backward(
    x: np.ndarray, a: np.ndarray, dout: np.ndarray, layer: Layer
) -> np.ndarray:
    n, h, w, d = x.shape
    ky, kx = layer.params["ky"], layer.params["kx"]
    h2, w2 = h // ky, w // kx
    xr = x[:, : h2 * ky, : w2 * kx].reshape(n, h2, ky, w2, kx, d)
    mask = xr == a[:, :, None, :, None, :]
    # ties share the gradient (the reference routes to the recorded
    # argmax, maxpool.cpp:57-70; identical on tie-free real activations)
    cnt = mask.sum(axis=(2, 4), keepdims=True)
    dxr = mask * (dout[:, :, None, :, None, :] / np.maximum(cnt, 1))
    dx = np.zeros_like(x)
    dx[:, : h2 * ky, : w2 * kx] = dxr.reshape(n, h2 * ky, w2 * kx, d)
    return dx


# ---------------------------------------------------------------------------
# weight vector <-> net plumbing
# ---------------------------------------------------------------------------


def _layer_slots(layer) -> list[tuple[str, tuple[int, ...]]]:
    """Deterministic (key, shape) order for one layer, recursing into
    parallel/reversed sub-stacks with composite '<branch>:<sub>:<key>'
    keys."""
    if layer.kind in ("parallel", "reversed"):
        out = []
        for bi, br in enumerate(layer.params["branches"]):
            for si, sub in enumerate(br):
                for key, shape in _layer_slots(sub):
                    out.append((f"{bi}:{si}:{key}", shape))
        return out
    return [(k, layer.weights[k].shape) for k in sorted(layer.weights)]


def trainable_slots(
    net: VGSLNetwork, layers: tuple[int, ...] | None = None
) -> list[tuple[int, str, tuple[int, ...]]]:
    """Deterministic (layer_idx, key, shape) order for flattening."""
    out = []
    for li, layer in enumerate(net.layers):
        if layers is not None and li not in layers:
            continue
        for key, shape in _layer_slots(layer):
            out.append((li, key, shape))
    return out


def flatten(net: VGSLNetwork, slots) -> np.ndarray:
    from .vgsl import resolve_weight

    parts = []
    for li, key, _s in slots:
        wd, leaf = resolve_weight(net.layers[li], key)
        parts.append(wd[leaf].ravel())
    return np.concatenate(parts).astype(np.float32)


def unflatten(net: VGSLNetwork, slots, vec: np.ndarray) -> None:
    from .vgsl import resolve_weight

    pos = 0
    for li, key, shape in slots:
        size = int(np.prod(shape))
        wd, leaf = resolve_weight(net.layers[li], key)
        wd[leaf] = vec[pos : pos + size].reshape(shape).astype(np.float32)
        pos += size


def flatten_grads(grads, slots) -> np.ndarray:
    out = []
    for li, key, shape in slots:
        g = grads.get(li, {}).get(key)
        out.append(
            g.ravel() if g is not None else np.zeros(int(np.prod(shape)), np.float32)
        )
    return np.concatenate(out).astype(np.float32)


class Adam:
    """Driver-side Adam (WeightMatrix::Update adam branch,
    src/lstm/weightmatrix.cpp:280-330: dw_sq_sum_/updates_ running
    moments with adam_beta, epsilon 1e-8)."""

    def __init__(self, dim: int, lr: float = 0.05, b1=0.9, b2=0.999):
        self.m = np.zeros(dim, np.float64)
        self.v = np.zeros(dim, np.float64)
        self.lr, self.b1, self.b2, self.t = lr, b1, b2, 0

    def step(self, w: np.ndarray, g: np.ndarray) -> np.ndarray:
        self.t += 1
        self.m = self.b1 * self.m + (1 - self.b1) * g
        self.v = self.b2 * self.v + (1 - self.b2) * g * g
        mh = self.m / (1 - self.b1**self.t)
        vh = self.v / (1 - self.b2**self.t)
        return (w - self.lr * mh / (np.sqrt(vh) + 1e-8)).astype(np.float32)


# ---------------------------------------------------------------------------
# per-line sample plumbing (render + labels) and the gradient kernel
# ---------------------------------------------------------------------------


def line_sample(text: str) -> np.ndarray:
    """Canonical 16-row line strip for a training text (text2image
    analogue — the fixture font is the deterministic 'font' the corpus
    renders with, so training and inference share one raster model)."""
    from ..functions.fonts import render_line

    return render_line(text, 1)


def labels_for_text(charset: str, text: str) -> list[int]:
    return [charset.index(c) for c in text]


def batch_gradients(
    net: VGSLNetwork,
    slots,
    texts: list[str],
    charset: str,
    blank: int,
    strips: list[np.ndarray] | None = None,
) -> tuple[np.ndarray, float, int, int]:
    """Summed gradient over a list of lines (one forward per width
    bucket, per-line CTC on the real width).  Returns
    (grad_flat, loss_sum, n_lines, n_exact) — n_exact is the greedy
    decode exact-match count (the trainer's error-rate probe,
    LSTMTrainer::ComputeErrorRates).

    ``strips``: pre-rendered line images overriding the clean
    text2image render — the degraded-corpus path (an .lstmf sample
    carries its own image; degradeimage augmentation trains here)."""
    from .fixture_model import PAD

    if strips is None:
        strips = [line_sample(t) for t in texts]
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(strips):
        buckets.setdefault(-(-(s.shape[1] + 2 * PAD) // 32), []).append(i)
    gsum = np.zeros(sum(int(np.prod(s)) for _l, _k, s in slots), np.float64)
    loss_sum, n_exact = 0.0, 0
    for key in sorted(buckets):
        idxs = buckets[key]
        wmax = key * 32
        x = np.zeros((len(idxs), 1, wmax, 16), dtype=np.float32)
        for j, i in enumerate(idxs):
            s = strips[i].astype(np.float32)
            x[j, 0, PAD : PAD + s.shape[1], :] = s.T
        logp, caches = forward_cache(net, x)
        dlog = np.zeros_like(logp)
        space_id = charset.index(" ")
        for j, i in enumerate(idxs):
            t_real = strips[i].shape[1] + 2 * PAD
            labels = labels_for_text(charset, texts[i])
            loss, dl = ctc_loss_grad(logp[j, :t_real], labels, blank)
            loss_sum += loss
            dlog[j, :t_real] = dl
            best = np.argmax(logp[j, :t_real], axis=1)
            keep = np.ones(len(best), bool)
            keep[1:] = best[1:] != best[:-1]
            dec = [int(c) for c in best[keep] if c != blank]
            # edge spaces are a feature of the input (end-of-line is
            # indistinguishable from a word gap); production decode
            # strips them too (decode_strips / SimpleTextOutput trim)
            while dec and dec[0] == space_id:
                dec.pop(0)
            while dec and dec[-1] == space_id:
                dec.pop()
            if dec == labels:
                n_exact += 1
        grads = backward(net, caches, dlog)
        gsum += flatten_grads(grads, slots)
    return gsum.astype(np.float32), loss_sum, len(texts), n_exact


# ---------------------------------------------------------------------------
# the distributed trainer
# ---------------------------------------------------------------------------


def distributed_gradient(
    spark,
    texts_df,
    spec: str,
    base_bc,
    vec: np.ndarray,
    charset: str,
    blank: int,
    train_layers: tuple[int, ...],
) -> tuple[np.ndarray, float, int, int]:
    """One full-batch gradient pass over ``texts_df`` (column ``text``).

    ONE mapInPandas emits a single model-sized partial-gradient row per
    partition (data-local, Arrow-batched, no per-row Python); the driver
    sums the handful of partition rows.  ``base_bc`` is a broadcast of
    the FULL weight vector (frozen layers); ``vec`` carries only the
    trainable slice and is re-broadcast each step.  100 TB story:
    gradient traffic is O(partitions x model), not O(rows); at 1000
    executors the partial rows go through treeReduce instead of a driver
    sum — this is the local[k] instance of exactly that plan."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(vec.astype(np.float32).tobytes())

    def udf(batches, _spec=spec, _charset=charset, _blank=blank,
            _train=train_layers):
        net = VGSLNetwork(_spec)
        unflatten(
            net,
            trainable_slots(net),
            np.frombuffer(base_bc.value, np.float32).copy(),
        )
        t_slots = trainable_slots(net, _train)
        unflatten(net, t_slots, np.frombuffer(bc.value, np.float32).copy())
        gsum, loss, n, n_exact = None, 0.0, 0, 0
        for pdf in batches:
            strips = None
            if "image_png" in pdf.columns:
                # the .lstmf image path: samples carry their own line
                # images (e.g. degradeimage-augmented corpora);
                # threshold 128 is the binarization the degraded grey
                # levels are calibrated to (degradeimage.cpp:144-146)
                from ..functions.png_codec import decode_gray_png

                strips = [
                    decode_gray_png(b) < 128 for b in pdf["image_png"]
                ]
            g, ls, nn, ne = batch_gradients(
                net, t_slots, list(pdf["text"]), _charset, _blank,
                strips=strips,
            )
            gsum = g if gsum is None else gsum + g
            loss += ls
            n += nn
            n_exact += ne
        if n:
            yield pd.DataFrame(
                {
                    "grad": [gsum.tobytes()],
                    "loss": [loss],
                    "n": [n],
                    "n_exact": [n_exact],
                }
            )

    parts = texts_df.mapInPandas(
        udf, schema="grad binary, loss double, n long, n_exact long"
    ).collect()
    bc.destroy()
    g = np.zeros(len(vec), np.float64)
    loss, n, n_exact = 0.0, 0, 0
    for row in parts:
        g += np.frombuffer(row.grad, np.float32)
        loss += row.loss
        n += row.n
        n_exact += row.n_exact
    return g, loss, n, n_exact


def distributed_finetune(
    spark,
    texts_df,
    base_net: VGSLNetwork,
    init_vec: np.ndarray,
    charset: str,
    blank: int,
    train_layers: tuple[int, ...],
    steps: int = 40,
    lr: float = 0.05,
) -> tuple[np.ndarray, list[dict]]:
    """Full-batch distributed Adam over ``texts_df`` (column ``text``).

    ``base_net`` supplies the frozen layers (the --continue_from model,
    lstmtraining.cpp:52-74); ``init_vec`` the starting values of the
    ``train_layers`` slice.  Deterministic up to float summation order;
    the demo nets converge to margins that make the decode invariant to
    it.  Early-exits when the whole batch greedy-decodes exactly (the
    trainer's best-error stopping probe, lstmtrainer.cpp:240-262).

    When ``texts_df`` carries an ``image_png`` column (an .lstmf-derived
    sample table, e.g. lstmf_to_df below), training consumes the
    carried images instead of re-rendering from text."""
    sc = spark.sparkContext
    base_vec = flatten(base_net, trainable_slots(base_net))
    base_bc = sc.broadcast(base_vec.tobytes())
    spec = base_net.spec
    cols = ["text"] + (
        ["image_png"] if "image_png" in texts_df.columns else []
    )
    texts_df = texts_df.select(*cols).cache()
    vec = init_vec.astype(np.float32)
    adam = Adam(len(vec), lr=lr)
    history: list[dict] = []
    for _step in range(steps):
        g, loss, n, n_exact = distributed_gradient(
            spark, texts_df, spec, base_bc, vec, charset, blank, train_layers
        )
        history.append({"loss": loss / max(n, 1), "exact": n_exact, "n": n})
        if n_exact == n:
            break
        vec = adam.step(vec, g / max(n, 1))
    base_bc.destroy()
    texts_df.unpersist()
    return vec, history
