"""VGSL network-spec parser + batched numpy forward pass.

Re-expresses the reference's trainable network stack on float32 BLAS:

- VGSL spec grammar: ``src/training/common/networkbuilder.h:52-123`` —
  e.g. ``[1,36,0,1 Ct5,5,16 Mp3,3 Lfys64 Lfx96 Lrx96 Lfx512 O1c105]``.
- Layers: convolution (``src/lstm/convolve.cpp`` + weightmatrix), maxpool
  (``src/lstm/maxpool.cpp``), LSTM forward/reversed/summarizing
  (``src/lstm/lstm.cpp:291`` — peephole-free CIFG=off variant), fully
  connected + softmax (``src/lstm/fullyconnected.cpp:129-230``).
- int8 SIMD kernels (``src/arch/intsimdmatrix*.cpp``) are replaced by
  batched float32 matmuls — the idiomatic-Spark answer to the reference's
  hand-written vectorization (SURVEY §4).
- Variable-width line batching follows the StrideMap design
  (``src/lstm/stridemap.cpp:1-187``): bucket by width, pad to the bucket
  max, mask the tail.

Weights are deterministic (seeded Glorot) — the sandbox has no traineddata;
the loader interface accepts explicit weight dicts so real weights can be
plugged in where available.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np


def _glorot(rng: np.random.Generator, shape: tuple[int, ...]) -> np.ndarray:
    fan_in = int(np.prod(shape[1:])) or 1
    limit = np.sqrt(6.0 / (fan_in + shape[0]))
    return rng.uniform(-limit, limit, shape).astype(np.float32)


@dataclass
class Layer:
    kind: str
    params: dict = field(default_factory=dict)
    weights: dict = field(default_factory=dict)

    def out_depth(self, in_depth: int) -> int:
        if self.kind == "conv":
            return self.params["filters"]
        if self.kind in ("lstm_x", "lstm_y_summary"):
            return self.params["units"] * (2 if self.params["bidi"] else 1)
        if self.kind == "lstm_2d_quad":
            return 4 * self.params["units"]
        if self.kind == "reconfig":
            return in_depth * self.params["ky"] * self.params["kx"]
        if self.kind == "fc":
            return self.params["n_out"]
        if self.kind == "output":
            return self.params["classes"]
        if self.kind in ("parallel", "reversed"):
            return self.params["out_depth"]
        return in_depth


class VGSLNetwork:
    """Parsed VGSL stack with a batched forward pass.

    forward() consumes [N, H, W, 1] float32 line tensors (N lines padded to
    a common width) and returns per-timestep class log-probs [N, W', C].
    """

    def __init__(self, spec: str, seed: int = 42):
        self.spec = spec
        self.layers: list[Layer] = []
        rng = np.random.default_rng(seed)
        m = re.match(r"\[(\d+),(\d+),(\d+),(\d+)\s+(.*)\]$", spec.strip())
        if not m:
            raise ValueError(f"bad VGSL spec: {spec!r}")
        self.batch, self.height, self.width, self.depth = (
            int(m.group(i)) for i in range(1, 5)
        )
        # Recursive-descent parse (BuildFromString, networkbuilder.cpp:87):
        # '(' opens an NT_PARALLEL group, '[' a nested Series, 'R<d>' an
        # NT_REPLICATED fan-out, 'Rx'/'Ry' a Reversed wrapper; everything
        # else is a simple layer token.
        tokens = re.findall(r"[()\[\]]|[^\s()\[\]]+", m.group(5))
        self.layers, i, depth, height = _parse_series(
            tokens, 0, self.depth, self.height, rng, stop=None
        )
        if i != len(tokens):
            raise ValueError(f"trailing tokens in VGSL spec: {tokens[i:]!r}")
        if not self.layers or self.layers[-1].kind != "output":
            raise ValueError("spec has no trailing output layer")
        self.n_classes = depth

    def load_weights(self, weights: dict[int, dict[str, np.ndarray]]) -> None:
        """Plug in externally trained weights: {layer_idx: {name: array}}.
        Composite keys ('<branch>:<sub>:<name>') address layers nested in
        parallel/reversed groups."""
        for i, wd in weights.items():
            for k, v in wd.items():
                wdict, leaf = resolve_weight(self.layers[i], k)
                expect = wdict[leaf].shape
                if v.shape != expect:
                    raise ValueError(f"layer {i} weight {k}: {v.shape} != {expect}")
                wdict[leaf] = v.astype(np.float32)

    def forward(self, x: np.ndarray) -> np.ndarray:
        """[N, H, W, D] -> log-softmax [N, W', C] (batched, BLAS-backed)."""
        for layer in self.layers:
            if layer.kind == "output":
                w, b = layer.weights["w"], layer.weights["b"]
                seq = _collapse_height(x)[:, 0]  # [N, W, D]
                logits = seq @ w.T + b
                mx = logits.max(-1, keepdims=True)
                e = np.exp(logits - mx)
                return (logits - mx) - np.log(e.sum(-1, keepdims=True))
            x = _apply_layer(x, layer)
        raise ValueError("spec has no output layer")  # pragma: no cover


def resolve_weight(layer: Layer, key: str) -> tuple[dict, str]:
    """Resolve a (possibly composite) weight key to its owning weights
    dict.  Composite keys '<branch>:<sub_idx>:<rest>' walk into
    parallel/reversed sub-stacks."""
    if layer.kind in ("parallel", "reversed") and ":" in key:
        b, sub, leaf = key.split(":", 2)
        return resolve_weight(
            layer.params["branches"][int(b)][int(sub)], leaf
        )
    return layer.weights, key


def iter_layers(layers: list[Layer]):
    """Depth-first walk over a layer stack including parallel/reversed
    sub-stacks (weight-bearing leaves and containers alike)."""
    for layer in layers:
        yield layer
        if layer.kind in ("parallel", "reversed"):
            for br in layer.params["branches"]:
                yield from iter_layers(br)


def _parse_series(tokens, i, depth, height, rng, stop):
    layers: list[Layer] = []
    while i < len(tokens) and tokens[i] != stop:
        lys, i, depth, height = _parse_element(tokens, i, depth, height, rng)
        layers.extend(lys)
    if stop is not None:
        if i >= len(tokens):
            raise ValueError(f"missing {stop!r} at end of VGSL group")
        i += 1
    return layers, i, depth, height


def _parse_element(tokens, i, depth, height, rng):
    """Parse ONE grammar element starting at tokens[i]; returns
    (layers, next_i, out_depth, out_height).  An element may expand to
    several flat layers (a '[series]', or F's implicit Reconfig)."""
    tok = tokens[i]
    if tok == "[":
        return _parse_series(tokens, i + 1, depth, height, rng, stop="]")
    if tok in (")", "]"):
        raise ValueError(f"unexpected {tok!r} in VGSL spec")
    if tok == "(":
        # ParseParallel (networkbuilder.cpp:171-187): every element runs
        # on the SAME input; outputs concatenate on depth
        # (Parallel::Forward, parallel.cpp:94-104 CopyPacking), so all
        # branches must agree on output width/height.
        i += 1
        branches, bdepths, bheights = [], [], []
        while i < len(tokens) and tokens[i] != ")":
            lys, i, d2, h2 = _parse_element(tokens, i, depth, height, rng)
            if any(ly.kind == "output" for ly in iter_layers(lys)):
                raise ValueError("output layer inside a (parallel) group")
            branches.append(lys)
            bdepths.append(d2)
            bheights.append(h2)
        if i >= len(tokens):
            raise ValueError("missing ) at end of (Parallel)")
        i += 1
        if not branches:
            raise ValueError("empty (parallel) group")
        if len(set(bheights)) != 1:
            raise ValueError(
                f"parallel branches disagree on output height: {bheights}"
            )
        layer = Layer(
            "parallel",
            {"branches": branches, "branch_depths": bdepths,
             "out_depth": sum(bdepths), "replicated": False},
        )
        return [layer], i, sum(bdepths), bheights[0]
    if tok[0] == "R" and len(tok) > 1 and (tok[1] in "xy" or tok[1].isdigit()):
        # ParseR (networkbuilder.cpp:189-224): Rx/Ry wrap the next element
        # in a Reversed; R<d> replicates it <d> times in parallel, each
        # replica independently initialized (the reference re-parses the
        # sub-spec per replica, so each draws fresh random weights).
        if tok[1] in "xy":
            axis, rest = tok[1], tok[2:]
            if rest:
                tokens.insert(i + 1, rest)
            lys, i2, d2, h2 = _parse_element(tokens, i + 1, depth, height, rng)
            if any(ly.kind == "output" for ly in iter_layers(lys)):
                raise ValueError("output layer inside an Rx/Ry wrapper")
            layer = Layer(
                "reversed",
                {"axis": axis, "branches": [lys],
                 "branch_depths": [d2], "out_depth": d2},
            )
            return [layer], i2, d2, h2
        mr = re.match(r"R(\d+)", tok)
        replicas = int(mr.group(1))
        if replicas <= 0:
            raise ValueError(f"invalid R spec: {tok!r}")
        rest = tok[mr.end():]
        if rest:
            tokens.insert(i + 1, rest)
        start = i + 1
        branches = []
        i2 = d2 = h2 = None
        for _ in range(replicas):
            lys, i2, d2, h2 = _parse_element(tokens, start, depth, height, rng)
            if any(ly.kind == "output" for ly in iter_layers(lys)):
                raise ValueError("output layer inside an R replication")
            branches.append(lys)
        layer = Layer(
            "parallel",
            {"branches": branches, "branch_depths": [d2] * replicas,
             "out_depth": d2 * replicas, "replicated": True},
        )
        return [layer], i2, d2 * replicas, h2
    lys, d2, h2 = _make_simple(tok, depth, height, rng)
    return lys, i + 1, d2, h2


def _make_simple(tok, depth, height, rng):
    """One non-structural VGSL token -> flat layer(s) + new (depth, height)."""
    layers: list[Layer] = []
    if tok.startswith("Ct") or tok.startswith("Cr"):
        ky, kx, nf = (int(v) for v in re.findall(r"\d+", tok)[:3])
        w = _glorot(rng, (nf, ky * kx * depth))
        b = np.zeros(nf, dtype=np.float32)
        layers.append(
            Layer(
                "conv",
                {"ky": ky, "kx": kx, "filters": nf,
                 "act": "tanh" if tok[1] == "t" else "relu"},
                {"w": w, "b": b},
            )
        )
        depth = nf
    elif tok.startswith("Mp"):
        ky, kx = (int(v) for v in re.findall(r"\d+", tok)[:2])
        layers.append(Layer("maxpool", {"ky": ky, "kx": kx}))
        height = max(1, height // ky)
    elif tok.startswith("S") and re.match(r"S\d+,\d+$", tok):
        # Reconfig (networkbuilder 'S', reconfig.cpp): stack
        # ky x kx tiles into depth — e.g. S2,1 halves height and
        # doubles depth.  Pure re-layout, no weights.
        ky, kx = (int(v) for v in re.findall(r"\d+", tok)[:2])
        layers.append(Layer("reconfig", {"ky": ky, "kx": kx}))
        depth *= ky * kx
        height = max(1, height // ky)
    elif re.match(r"L2xy\d+$", tok):
        # True 2-D LSTM quad (networkbuilder BuildLSTMXYQuad,
        # networkbuilder.cpp:387-410): four genuinely-2D LSTMs
        # (x-recurrence + y-recurrence with the 5th GFS forget
        # gate, lstm.cpp Is2D) over the 4 direction reversals,
        # outputs concatenated.  Scan is x-major here (the
        # reference wraps the quad in an XYTranspose for the
        # 'y' spelling — a scan-order choice the 4 reversals
        # already cover; documented simplification).
        units = int(tok[4:])
        wts: dict = {}
        for d in range(4):
            wts[f"d{d}_wx"] = _glorot(rng, (5 * units, depth))
            wts[f"d{d}_whx"] = _glorot(rng, (5 * units, units))
            wts[f"d{d}_why"] = _glorot(rng, (5 * units, units))
            wts[f"d{d}_b"] = np.zeros(5 * units, dtype=np.float32)
        layers.append(Layer("lstm_2d_quad", {"units": units}, wts))
        depth = 4 * units
        # height preserved: the 2-D LSTM outputs per-pixel h
    elif tok.startswith("Lfys") or tok.startswith("Lrys"):
        # y-summarizing LSTM (vgslspecs.cpp L..ys): runs over the
        # HEIGHT dimension per x-column with input depth D and
        # keeps only the final step, so height collapses to 1.
        units = int(re.findall(r"\d+", tok)[0])
        layers.append(
            Layer(
                "lstm_y_summary",
                {"units": units, "bidi": False,
                 "reverse": tok.startswith("Lr")},
                _lstm_weights(rng, depth, units),
            )
        )
        depth = units
        height = 1
    elif tok.startswith(("Lfx", "Lrx", "Lbx")):
        units = int(re.findall(r"\d+", tok)[0])
        bidi = tok.startswith("Lbx")
        wts = _lstm_weights(rng, height * depth, units)
        if bidi:
            wts.update(
                {f"r_{k}": v.copy() for k, v in
                 _lstm_weights(rng, height * depth, units).items()}
            )
        layers.append(
            Layer(
                "lstm_x",
                {"units": units, "bidi": bidi,
                 "reverse": tok.startswith("Lrx")},
                wts,
            )
        )
        depth = units * (2 if bidi else 1)
        height = 1
    elif re.match(r"F[strl]\d+$", tok):
        # Fully connected (networkbuilder 'F' /
        # BuildFullyConnected): a dense layer with the chosen
        # nonlinearity per x step — s=sigmoid(Logistic) t=tanh
        # r=relu l=linear.  The builder inserts an explicit
        # Reconfig when H > 1 (FCSeries, networkbuilder.cpp:
        # 415-421); we mirror that as a REAL reconfig layer so
        # the serialized tree matches.  (The reference's
        # FCReconfig also folds width — only legal for
        # fixed-width inputs; variable-width OCR strips fold
        # height only, documented divergence.)
        n_out = int(tok[2:])
        if height > 1:
            layers.append(Layer("reconfig", {"ky": height, "kx": 1}))
            depth *= height
            height = 1
        layers.append(
            Layer(
                "fc",
                {"act": tok[1], "n_out": n_out},
                {"w": _glorot(rng, (n_out, depth)),
                 "b": np.zeros(n_out, dtype=np.float32)},
            )
        )
        depth = n_out
    elif tok.startswith("O1c"):
        classes = int(tok[3:])
        layers.append(
            Layer(
                "output",
                {"classes": classes},
                {"w": _glorot(rng, (classes, height * depth)),
                 "b": np.zeros(classes, dtype=np.float32)},
            )
        )
        depth = classes
    else:
        raise ValueError(f"unsupported VGSL token: {tok!r}")
    return layers, depth, height


def _apply_layer(x: np.ndarray, layer: Layer) -> np.ndarray:
    """Forward one non-output layer (shared by VGSLNetwork.forward and
    the parallel/reversed sub-stack walks)."""
    if layer.kind == "conv":
        return _conv(x, layer)
    if layer.kind == "maxpool":
        return _maxpool(x, layer)
    if layer.kind == "reconfig":
        return _reconfig(x, layer)
    if layer.kind == "lstm_2d_quad":
        return _lstm_2d_quad(x, layer)
    if layer.kind == "fc":
        return _fc(x, layer)
    if layer.kind == "lstm_y_summary":
        return _lstm_over_y_summary(x, layer)
    if layer.kind == "lstm_x":
        return _lstm_over_x(_collapse_height(x), layer)
    if layer.kind == "parallel":
        # Parallel::Forward (parallel.cpp:94-104): every branch consumes
        # the SAME input; outputs pack depth-wise in stack order.
        outs = [_apply_stack(x, br) for br in layer.params["branches"]]
        return np.concatenate(outs, axis=-1)
    if layer.kind == "reversed":
        # Reversed::Forward (reversed.cpp): reverse the chosen axis,
        # run the wrapped net, reverse its output back.
        ax = 1 if layer.params["axis"] == "y" else 2
        xi = np.ascontiguousarray(np.flip(x, axis=ax))
        o = _apply_stack(xi, layer.params["branches"][0])
        return np.ascontiguousarray(np.flip(o, axis=ax))
    raise ValueError(f"no forward for layer kind {layer.kind!r}")


def _apply_stack(x: np.ndarray, layers: list[Layer]) -> np.ndarray:
    for layer in layers:
        x = _apply_layer(x, layer)
    return x


def _lstm_weights(rng: np.random.Generator, d_in: int, units: int) -> dict:
    return {
        "wx": _glorot(rng, (4 * units, d_in)),
        "wh": _glorot(rng, (4 * units, units)),
        "b": np.zeros(4 * units, dtype=np.float32),
    }


def _collapse_height(x: np.ndarray) -> np.ndarray:
    """[N, H, W, D] -> [N, 1, W, H*D] (x-major sequence view)."""
    if x.shape[1] == 1:
        return x
    n, h, w, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(n, w, h * d)[:, None, :, :]


def _conv(x: np.ndarray, layer: Layer) -> np.ndarray:
    """Same-padded conv via im2col + one matmul (the fp32 BLAS analogue of
    the reference's int8 SIMD matvec, weightmatrix.h:70-184)."""
    n, h, w, d = x.shape
    ky, kx = layer.params["ky"], layer.params["kx"]
    py, px = ky // 2, kx // 2
    xp = np.pad(x, ((0, 0), (py, ky - 1 - py), (px, kx - 1 - px), (0, 0)))
    win = np.lib.stride_tricks.sliding_window_view(xp, (ky, kx), axis=(1, 2))
    cols = win.transpose(0, 1, 2, 4, 5, 3).reshape(n * h * w, ky * kx * d)
    out = cols @ layer.weights["w"].T + layer.weights["b"]
    out = out.reshape(n, h, w, layer.params["filters"])
    if layer.params["act"] == "tanh":
        return np.tanh(out, dtype=np.float32)
    return np.maximum(out, 0.0)


def _maxpool(x: np.ndarray, layer: Layer) -> np.ndarray:
    n, h, w, d = x.shape
    ky, kx = layer.params["ky"], layer.params["kx"]
    h2, w2 = h // ky, w // kx
    x = x[:, : h2 * ky, : w2 * kx]
    return x.reshape(n, h2, ky, w2, kx, d).max(axis=(2, 4))


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-z))


def _lstm_dir(seq: np.ndarray, wts: dict, prefix: str = "") -> np.ndarray:
    """Batched LSTM over the time axis: seq [N, T, D] -> [N, T, U].

    The input projection for ALL timesteps is one big matmul; only the
    recurrent h-term is sequential (lstm.cpp:291 semantics, no peepholes).
    """
    wx, wh, b = wts[prefix + "wx"], wts[prefix + "wh"], wts[prefix + "b"]
    n, t, d = seq.shape
    units = wh.shape[1]
    gates_x = seq.reshape(n * t, d) @ wx.T
    gates_x = gates_x.reshape(n, t, 4 * units) + b
    h = np.zeros((n, units), dtype=np.float32)
    c = np.zeros((n, units), dtype=np.float32)
    out = np.empty((n, t, units), dtype=np.float32)
    for step in range(t):
        g = gates_x[:, step] + h @ wh.T
        i = _sigmoid(g[:, :units])
        f = _sigmoid(g[:, units : 2 * units])
        o = _sigmoid(g[:, 2 * units : 3 * units])
        u = np.tanh(g[:, 3 * units :])
        c = f * c + i * u
        h = o * np.tanh(c)
        out[:, step] = h
    return out


def _int_cast_rounded(x: np.ndarray) -> np.ndarray:
    """IntCastRounded (helpers.h:184-189): round half AWAY from zero
    (np.rint would round half to even)."""
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))


def _quantize_rows(mat: np.ndarray) -> np.ndarray:
    """Per-row int8 quantize-dequantize (WeightMatrix::ConvertToInt,
    weightmatrix.cpp:110-140: scale = row max_abs / 127, values rounded
    to int8 with IntCastRounded).  Returns the float32 weights the int
    kernel would apply."""
    out = np.empty_like(mat, dtype=np.float32)
    for r in range(mat.shape[0]):
        max_abs = np.abs(mat[r]).max()
        scale = max_abs / 127.0 if max_abs > 0 else 1.0
        out[r] = _int_cast_rounded(mat[r] / scale).clip(-128, 127) * scale
    return out


def int8_matrix_dot_vector(
    w: np.ndarray, scales: np.ndarray, u: np.ndarray
) -> np.ndarray:
    """The generic int8 MatrixDotVector (intsimdmatrix.h / weightmatrix
    int mode): int8 weight rows (bias as last column) x int8 input
    (bias slot driven at INT8_MAX), exact int32 accumulation, then one
    per-row double scale.  numpy's int32 GEMV plays the role of the
    reference's SSE/AVX2 kernels; parity with the per-element C loop is
    pinned by the intsimdmatrix_test port."""
    no, ni1 = w.shape
    u_full = np.zeros(ni1, dtype=np.int32)
    u_full[: len(u)] = u
    u_full[ni1 - 1] = 127  # bias input
    total = w.astype(np.int32) @ u_full
    return total.astype(np.float64) * np.asarray(scales, dtype=np.float64)


def convert_to_int(net: "VGSLNetwork") -> "VGSLNetwork":
    """In-place int8 conversion of every weight matrix (the inference
    analogue of LSTMRecognizer::ConvertToInt).  The reference stores one
    WeightMatrix per gate spanning [input | state | bias] (na = ni + ns
    columns, lstm.cpp), so wx/wh/b rows are quantized jointly; conv and
    output layers quantize [w | b] rows.  Tested by the TestIntMode port
    in tests/test_lstm_recode_squashed.py."""
    for layer in iter_layers(net.layers):
        w = layer.weights
        if layer.kind in ("conv", "output", "fc"):
            joint = _quantize_rows(
                np.concatenate([w["w"], w["b"][:, None]], axis=1)
            )
            w["w"], w["b"] = joint[:, :-1], joint[:, -1]
        elif layer.kind == "lstm_2d_quad":
            for d in range(4):
                joint = _quantize_rows(np.concatenate(
                    [w[f"d{d}_wx"], w[f"d{d}_whx"], w[f"d{d}_why"],
                     w[f"d{d}_b"][:, None]], axis=1))
                n_in = w[f"d{d}_wx"].shape[1]
                u = w[f"d{d}_whx"].shape[1]
                w[f"d{d}_wx"] = joint[:, :n_in]
                w[f"d{d}_whx"] = joint[:, n_in:n_in + u]
                w[f"d{d}_why"] = joint[:, n_in + u:-1]
                w[f"d{d}_b"] = joint[:, -1]
        elif layer.kind in ("lstm_x", "lstm_y_summary"):
            for prefix in ("", "r_") if layer.params.get("bidi") else ("",):
                joint = _quantize_rows(
                    np.concatenate(
                        [w[prefix + "wx"], w[prefix + "wh"],
                         w[prefix + "b"][:, None]],
                        axis=1,
                    )
                )
                d_in = w[prefix + "wx"].shape[1]
                w[prefix + "wx"] = joint[:, :d_in]
                w[prefix + "wh"] = joint[:, d_in:-1]
                w[prefix + "b"] = joint[:, -1]
    return net


K_STATE_CLIP = 100.0  # lstm.cpp:71


def _reconfig(x: np.ndarray, layer: Layer) -> np.ndarray:
    """Reconfig (reconfig.cpp:82-103 / networkbuilder 'S'): stack
    ky x kx tiles into depth, X-MAJOR within the tile — the reference
    writes block (x*y_scale + y)*ni, so weight-layout parity with real
    models requires the kx axis outermost.
    [N, H, W, D] -> [N, H/ky, W/kx, kx*ky*D]."""
    n, h, w, d = x.shape
    ky, kx = layer.params["ky"], layer.params["kx"]
    h2, w2 = h // ky, w // kx
    if h2 == 0 or w2 == 0:
        raise ValueError(
            f"Reconfig S{ky},{kx}: input {h}x{w} smaller than the tile")
    x = x[:, : h2 * ky, : w2 * kx]
    x = x.reshape(n, h2, ky, w2, kx, d)
    return x.transpose(0, 1, 3, 4, 2, 5).reshape(n, h2, w2, ky * kx * d)


def _lstm_2d_dir(
    x: np.ndarray, wts: dict, prefix: str, want_cache: bool = False
):
    """One true 2-D LSTM pass (lstm.cpp Forward with Is2D, x-major scan):
    each cell reads [input, h_prev_x, h_prev_y] through FIVE gates —
    CI/GI/GF1/GFS/GO — and MAX-POOLS the two forget paths per unit
    (lstm.cpp:447-462: whichever forget gate is larger forwards ITS
    state).  x-state resets at row starts so forward and BPTT are
    exactly consistent (the reference carries x-state across row
    boundaries in forward but truncates the matching gradient at row
    ends — same receptive-field intent, made self-consistent here).

    [N, H, W, D] -> [N, H, W, U] (+ caches when want_cache)."""
    wx = wts[prefix + "wx"]
    whx = wts[prefix + "whx"]
    why = wts[prefix + "why"]
    b = wts[prefix + "b"]
    n, h, w, d = x.shape
    units = whx.shape[1]
    gates_x = (
        x.reshape(n * h * w, d).astype(np.float64) @ wx.T.astype(np.float64)
    ).reshape(n, h, w, 5 * units) + b
    out = np.zeros((n, h, w, units), dtype=np.float64)
    if want_cache:
        ci_a = np.empty((n, h, w, units), np.float64)
        gi_a = np.empty_like(ci_a)
        gf1_a = np.empty_like(ci_a)
        gfs_a = np.empty_like(ci_a)
        go_a = np.empty_like(ci_a)
        st_a = np.empty_like(ci_a)
        fg2_a = np.zeros((n, h, w, units), dtype=bool)  # which_fg == 2
    state_buf = np.zeros((n, w, units), dtype=np.float64)  # prev row states
    out_buf = np.zeros((n, w, units), dtype=np.float64)  # prev row outputs
    for y in range(h):
        h_x = np.zeros((n, units), dtype=np.float64)
        state_x = np.zeros((n, units), dtype=np.float64)
        for xx in range(w):
            g = (
                gates_x[:, y, xx].astype(np.float64)
                + h_x @ whx.T
                + out_buf[:, xx] @ why.T
            )
            ci = np.tanh(g[:, :units])
            gi = _sigmoid(g[:, units:2 * units])
            gf1 = _sigmoid(g[:, 2 * units:3 * units])
            gfs = _sigmoid(g[:, 3 * units:4 * units])
            go = _sigmoid(g[:, 4 * units:])
            state = gf1 * state_x
            fg2 = np.zeros((n, units), dtype=bool)
            if y > 0:
                fg2 = gf1 < gfs
                state = np.where(fg2, gfs * state_buf[:, xx], state)
            state = np.clip(state + ci * gi, -K_STATE_CLIP, K_STATE_CLIP)
            hcur = np.tanh(state) * go
            out[:, y, xx] = hcur
            if want_cache:
                ci_a[:, y, xx] = ci
                gi_a[:, y, xx] = gi
                gf1_a[:, y, xx] = gf1
                gfs_a[:, y, xx] = gfs
                go_a[:, y, xx] = go
                st_a[:, y, xx] = state
                fg2_a[:, y, xx] = fg2
            state_buf[:, xx] = state
            out_buf[:, xx] = hcur
            state_x, h_x = state, hcur
    if not want_cache:
        return out
    return out, {
        "ci": ci_a, "gi": gi_a, "gf1": gf1_a, "gfs": gfs_a, "go": go_a,
        "state": st_a, "fg2": fg2_a, "x": x,
    }


_QUAD_FLIPS = [  # (flip_x, flip_y) per direction, networkbuilder.cpp:387-410
    (False, False), (True, False), (True, True), (False, True),
]


def _lstm_2d_quad(x: np.ndarray, layer: Layer) -> np.ndarray:
    outs = []
    for d, (fx, fy) in enumerate(_QUAD_FLIPS):
        xi = x[:, ::-1] if fy else x
        xi = xi[:, :, ::-1] if fx else xi
        o = _lstm_2d_dir(np.ascontiguousarray(xi), layer.weights, f"d{d}_")
        o = o[:, :, ::-1] if fx else o
        o = o[:, ::-1] if fy else o
        outs.append(o)
    return np.concatenate(outs, axis=-1).astype(np.float32)


_FC_ACTS = {
    "s": _sigmoid,
    "t": np.tanh,
    "r": lambda z: np.maximum(z, 0.0),
    "l": lambda z: z,
}


def _fc(x: np.ndarray, layer: Layer) -> np.ndarray:
    """Fully connected over the height-collapsed depth per x step
    (fullyconnected.cpp Forward)."""
    seq = _collapse_height(x)[:, 0]  # [N, W, H*D]
    z = seq @ layer.weights["w"].T + layer.weights["b"]
    return _FC_ACTS[layer.params["act"]](z)[:, None, :, :].astype(np.float32)


def _lstm_over_y_summary(x: np.ndarray, layer: Layer) -> np.ndarray:
    """Lfys/Lrys: LSTM over the height axis per (image, column), keeping
    only the last step (lstm.cpp Forward with NT_LSTM_SUMMARY: the
    summarizing variant reduces the sequence dim to 1).  [N, H, W, D] ->
    [N, 1, W, units].  Lfys walks rows top-down; Lrys bottom-up."""
    n, h, w, d = x.shape
    seq = x.transpose(0, 2, 1, 3).reshape(n * w, h, d)
    if layer.params.get("reverse"):
        seq = seq[:, ::-1]
    out = _lstm_dir(seq, layer.weights)[:, -1]  # [N*W, units]
    return out.reshape(n, w, -1)[:, None, :, :]


def _lstm_over_x(x: np.ndarray, layer: Layer) -> np.ndarray:
    n, h, w, d = x.shape
    seq = x.reshape(n, w, h * d) if h == 1 else x.transpose(0, 2, 1, 3).reshape(n, w, h * d)
    if layer.params.get("reverse"):
        seq = seq[:, ::-1]
    fwd = _lstm_dir(seq, layer.weights)
    if layer.params.get("reverse"):
        fwd = fwd[:, ::-1]
    if layer.params["bidi"]:
        bwd = _lstm_dir(seq[:, ::-1], layer.weights, prefix="r_")[:, ::-1]
        fwd = np.concatenate([fwd, bwd], axis=-1)
    return fwd[:, None, :, :]


def bucket_by_width(
    strips: list[np.ndarray], bucket_quantum: int = 32
) -> list[tuple[list[int], np.ndarray]]:
    """StrideMap-style width bucketing: group line strips into padded
    batches (stridemap.cpp:1-187).  Returns [(orig_indices, tensor)] with
    tensor [N, H, Wmax, 1] float32."""
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(strips):
        key = -(-s.shape[1] // bucket_quantum)
        buckets.setdefault(key, []).append(i)
    out = []
    for key in sorted(buckets):
        idxs = buckets[key]
        wmax = key * bucket_quantum
        h = strips[idxs[0]].shape[0]
        t = np.zeros((len(idxs), h, wmax, 1), dtype=np.float32)
        for j, i in enumerate(idxs):
            s = strips[i].astype(np.float32)
            t[j, :, : s.shape[1], 0] = s
        out.append((idxs, t))
    return out
