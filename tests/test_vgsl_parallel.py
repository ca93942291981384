"""VGSL '('-parallel groups, R<d> replication and Rx/Ry reversal wrappers
(NetworkBuilder::ParseParallel networkbuilder.cpp:171-187, ParseR
:189-224; Parallel::Forward parallel.cpp:94-104; Reversed reversed.cpp).

Covers: parse semantics (depth concat, same-input fan-out, independent
replica weights), forward equivalence against hand-built compositions,
container round-trips (fp32 + int8), and grammar error cases.  The
matching numerical grad-checks live in test_training.py's parametrized
sweep.
"""

import numpy as np
import pytest

from tesseract_spark.lstm.tessdata import (
    Reader,
    deserialize_network,
    serialize_network,
)
from tesseract_spark.lstm.vgsl import VGSLNetwork, convert_to_int, iter_layers


def _x(shape, seed=5):
    return np.random.default_rng(seed).normal(0, 1, shape).astype(np.float32)


def test_parallel_concats_branch_outputs_on_depth():
    """(Lfx Lrx) == depth-concat of the two nets run on the SAME input
    (Parallel::Forward CopyPacking order)."""
    net = VGSLNetwork("[1,1,0,3 (Lfx8 Lrx8) O1c7]", seed=7)
    par = net.layers[0]
    assert par.kind == "parallel" and not par.params["replicated"]
    assert par.params["out_depth"] == 16
    x = _x((2, 1, 9, 3))

    # run each branch alone through a single-branch net sharing weights
    from tesseract_spark.lstm.vgsl import _apply_stack

    lhs = _apply_stack(x, par.params["branches"][0])
    rhs = _apply_stack(x, par.params["branches"][1])
    both = _apply_stack(x, [par])
    assert np.allclose(both[..., :8], lhs)
    assert np.allclose(both[..., 8:], rhs)


def test_replicated_branches_draw_independent_weights():
    """R<d> re-parses the element per replica (ParseR str_copy loop), so
    each copy gets its own random init."""
    net = VGSLNetwork("[1,8,0,1 R3Ct3,3,4 Mp2,2 Lfys6 O1c7]", seed=7)
    par = net.layers[0]
    assert par.kind == "parallel" and par.params["replicated"]
    assert len(par.params["branches"]) == 3
    assert par.params["out_depth"] == 12
    w0 = par.params["branches"][0][0].weights["w"]
    w1 = par.params["branches"][1][0].weights["w"]
    w2 = par.params["branches"][2][0].weights["w"]
    assert not np.allclose(w0, w1)
    assert not np.allclose(w1, w2)
    # and the net still runs end to end
    assert net.forward(_x((2, 8, 12, 1))).shape == (2, 6, 7)


def test_rx_wrapper_equals_flip_apply_flip():
    """Rx<net> == flip x, run the wrapped net, flip back
    (Reversed::Forward)."""
    net = VGSLNetwork("[1,8,0,1 RxCt3,3,4 Mp2,2 Lfys6 O1c7]", seed=11)
    rev = net.layers[0]
    assert rev.kind == "reversed" and rev.params["axis"] == "x"
    from tesseract_spark.lstm.vgsl import _apply_stack

    x = _x((2, 8, 12, 1))
    inner = rev.params["branches"][0]
    manual = np.flip(
        _apply_stack(np.ascontiguousarray(np.flip(x, axis=2)), inner), axis=2
    )
    assert np.allclose(_apply_stack(x, [rev]), manual)


def test_nested_series_branch_inside_parallel():
    """A '[...]'-bracketed series is one parallel branch, exactly as
    BuildFromString's '[' case feeds ParseParallel."""
    net = VGSLNetwork("[1,1,0,2 ([Lfx3 Lfx3] Lrx3) Lfx4 O1c5]", seed=3)
    par = net.layers[0]
    assert [len(b) for b in par.params["branches"]] == [2, 1]
    assert par.params["out_depth"] == 6
    assert net.forward(_x((2, 1, 8, 2))).shape == (2, 8, 5)


@pytest.mark.parametrize("int_mode", [False, True])
@pytest.mark.parametrize(
    "spec,shape",
    [
        ("[1,1,0,3 (Lfx8 Lrx8) O1c7]", (2, 1, 9, 3)),
        ("[1,8,0,1 R2Ct3,3,4 Mp2,2 Lfys6 O1c7]", (2, 8, 12, 1)),
        ("[1,8,0,1 RxCt3,3,4 Mp2,2 Lfys6 O1c7]", (2, 8, 12, 1)),
        ("[1,1,0,2 ([Lfx3 Lfx3] Lrx3) Lfx4 O1c5]", (2, 1, 8, 2)),
        ("[1,6,0,1 Ry[Ct3,3,2 Mp2,2] Lfys4 O1c6]", (2, 6, 8, 1)),
    ],
)
def test_container_round_trip(spec, shape, int_mode):
    """Parallel/Replicated/RTLReversed/TTBReversed records round-trip
    byte-stably and reproduce the forward pass, fp32 and int8."""
    net = VGSLNetwork(spec, seed=7)
    if int_mode:
        net = convert_to_int(net)
    blob = serialize_network(net, int_mode=int_mode)
    net2 = deserialize_network(Reader(blob), spec)
    x = _x(shape)
    assert np.allclose(net.forward(x), net2.forward(x), atol=1e-4)
    assert serialize_network(net2, int_mode=int_mode) == blob


def test_convert_to_int_reaches_nested_weights():
    net = VGSLNetwork("[1,1,0,3 (Lfx8 Lrx8) O1c7]", seed=7)
    convert_to_int(net)
    for layer in iter_layers(net.layers):
        for k, v in layer.weights.items():
            if k.endswith("wx"):
                # every row must now be an exact multiple of its scale
                row = v[0]
                nz = row[np.abs(row) > 0]
                if nz.size:
                    scale = np.abs(nz).max() / np.round(
                        np.abs(nz).max() / (np.abs(nz).max() / 127.0)
                    )
                    assert scale > 0


@pytest.mark.parametrize(
    "bad",
    [
        "[1,1,0,3 (Lfx4 Lrx4 O1c5]",  # missing )
        "[1,1,0,3 () O1c5]",  # empty group
        "[1,8,0,1 (Lfx4 Ct3,3,2) O1c5]",  # branch heights disagree
        "[1,1,0,3 (Lfx4 O1c5) O1c5]",  # output inside a group
        "[1,1,0,3 R0Lfx4 O1c5]",  # zero replicas
    ],
)
def test_grammar_errors(bad):
    with pytest.raises(ValueError):
        VGSLNetwork(bad)


def test_flat_specs_unchanged_by_parser_rewrite():
    """The recursive-descent rewrite preserves the flat grammar: same
    layer kinds, same deterministic weights for a given seed."""
    spec = "[1,36,0,1 Ct5,5,16 Mp3,3 Lfys64 Lfx96 Lrx96 Lfx512 O1c111]"
    net = VGSLNetwork(spec, seed=42)
    assert [ly.kind for ly in net.layers] == [
        "conv", "maxpool", "lstm_y_summary", "lstm_x", "lstm_x",
        "lstm_x", "output",
    ]
    assert net.n_classes == 111
    # deterministic init: same seed -> same weights
    net2 = VGSLNetwork(spec, seed=42)
    assert np.array_equal(net.layers[0].weights["w"],
                          net2.layers[0].weights["w"])
