"""Tests for the native ONNX-to-JAX executor (svi_tpu/utils/onnx_jax.py).

The reference runs DWPose through onnxruntime (dwpose/wholebody.py:8-17);
this executor replaces it. Op semantics are golden-tested against torch
(conv/bn/pool/resize are the ops the YOLOX-L + DWPose graphs consist of), and
the protobuf wire-format parser is additionally validated against a
hand-assembled byte fixture independent of the module's own writer.
"""

import numpy as np
import pytest
import torch

from svi_tpu.utils import onnx_jax


def run_model(nodes, initializers, inputs, outputs, feeds):
    data = onnx_jax.build_model(nodes, initializers, inputs, outputs)
    sess = onnx_jax.InferenceSession(data)
    return sess.run(None, feeds)


def test_parser_handmade_bytes():
    """Parse a hand-assembled ModelProto (graph { node {Relu x->y} input x
    output y }) written byte-by-byte from the protobuf spec — independent of
    build_model."""
    def ld(fno, payload):
        return bytes([fno << 3 | 2, len(payload)]) + payload

    node = ld(1, b"x") + ld(2, b"y") + ld(4, b"Relu")
    graph = ld(1, node) + ld(11, ld(1, b"x")) + ld(12, ld(1, b"y"))
    model = ld(7, graph)
    g = onnx_jax.parse_model(model)
    assert g.inputs == ["x"] and g.outputs == ["y"]
    assert g.nodes[0].op_type == "Relu"
    sess = onnx_jax.InferenceSession(model)
    out = sess.run(None, {"x": np.array([-1.0, 2.0], np.float32)})[0]
    np.testing.assert_array_equal(out, [0.0, 2.0])


def test_tensor_roundtrip_dtypes():
    rng = np.random.default_rng(0)
    for arr in [rng.standard_normal((3, 4)).astype(np.float32),
                rng.integers(-5, 5, (2, 3)).astype(np.int64),
                rng.integers(0, 2, (4,)).astype(np.bool_),
                rng.standard_normal((2, 2, 2)).astype(np.float16)]:
        data = onnx_jax.build_model(
            [("Identity", ["w"], ["y"], {})], {"w": arr}, [], ["y"])
        out = onnx_jax.InferenceSession(data).run(None, {})[0]
        np.testing.assert_array_equal(out, arr)


def test_conv_bn_silu_maxpool_vs_torch():
    """The YOLOX building block: Conv(s2,p1) + BN + SiLU (Sigmoid*Mul in
    onnx) + MaxPool ceil_mode."""
    torch.manual_seed(0)
    m = torch.nn.Sequential(
        torch.nn.Conv2d(3, 8, 3, stride=2, padding=1),
        torch.nn.BatchNorm2d(8),
        torch.nn.SiLU(),
        torch.nn.MaxPool2d(3, stride=2, ceil_mode=True),
    ).eval()
    x = torch.randn(1, 3, 17, 23)
    with torch.no_grad():
        ref = m(x).numpy()
    conv, bn = m[0], m[1]
    nodes = [
        ("Conv", ["x", "cw", "cb"], ["c"],
         {"strides": [2, 2], "pads": [1, 1, 1, 1], "kernel_shape": [3, 3]}),
        ("BatchNormalization", ["c", "bw", "bb", "bm", "bv"], ["n"],
         {"epsilon": float(bn.eps)}),
        ("Sigmoid", ["n"], ["s"], {}),
        ("Mul", ["n", "s"], ["silu"], {}),
        ("MaxPool", ["silu"], ["y"],
         {"kernel_shape": [3, 3], "strides": [2, 2], "ceil_mode": 1}),
    ]
    inits = {
        "cw": conv.weight.detach().numpy(), "cb": conv.bias.detach().numpy(),
        "bw": bn.weight.detach().numpy(), "bb": bn.bias.detach().numpy(),
        "bm": bn.running_mean.numpy(), "bv": bn.running_var.numpy(),
    }
    out = run_model(nodes, inits, ["x"], ["y"], {"x": x.numpy()})[0]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_depthwise_conv_and_convtranspose_vs_torch():
    torch.manual_seed(1)
    dw = torch.nn.Conv2d(6, 6, 5, padding=2, groups=6).eval()
    ct = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1).eval()
    x = torch.randn(2, 6, 9, 11)
    with torch.no_grad():
        ref = ct(dw(x)).numpy()
    nodes = [
        ("Conv", ["x", "dw", "db"], ["h"],
         {"pads": [2, 2, 2, 2], "group": 6, "kernel_shape": [5, 5]}),
        ("ConvTranspose", ["h", "tw", "tb"], ["y"],
         {"strides": [2, 2], "pads": [1, 1, 1, 1], "kernel_shape": [4, 4]}),
    ]
    inits = {"dw": dw.weight.detach().numpy(), "db": dw.bias.detach().numpy(),
             "tw": ct.weight.detach().numpy(), "tb": ct.bias.detach().numpy()}
    out = run_model(nodes, inits, ["x"], ["y"], {"x": x.numpy()})[0]
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_gemm_matmul_softmax_vs_torch():
    torch.manual_seed(2)
    lin = torch.nn.Linear(12, 7).eval()
    x = torch.randn(5, 12)
    with torch.no_grad():
        ref = torch.softmax(lin(x), dim=-1).numpy()
    nodes = [
        ("Gemm", ["x", "w", "b"], ["h"], {"transB": 1}),
        ("Softmax", ["h"], ["y"], {"axis": -1}),
    ]
    inits = {"w": lin.weight.detach().numpy(), "b": lin.bias.detach().numpy()}
    out = run_model(nodes, inits, ["x"], ["y"], {"x": x.numpy()})[0]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_resize_nearest_2x_and_bilinear_vs_torch():
    torch.manual_seed(3)
    x = torch.randn(1, 4, 6, 5)
    ref_n = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest").numpy()
    nodes = [("Resize", ["x", "", "scales"], ["y"],
              {"mode": b"nearest",
               "coordinate_transformation_mode": b"asymmetric"})]
    inits = {"scales": np.array([1, 1, 2, 2], np.float32)}
    out = run_model(nodes, inits, ["x"], ["y"], {"x": x.numpy()})[0]
    np.testing.assert_array_equal(out, ref_n)

    ref_l = torch.nn.functional.interpolate(
        x, scale_factor=2, mode="bilinear", align_corners=False).numpy()
    nodes = [("Resize", ["x", "", "scales"], ["y"],
              {"mode": b"linear",
               "coordinate_transformation_mode": b"half_pixel"})]
    out = run_model(nodes, inits, ["x"], ["y"], {"x": x.numpy()})[0]
    np.testing.assert_allclose(out, ref_l, rtol=1e-4, atol=1e-5)


def test_shape_plumbing_ops():
    """Shape/Gather/Concat/Reshape/Slice/Transpose/Split — the dynamic-shape
    plumbing exported CNN heads carry."""
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    nodes = [
        ("Shape", ["x"], ["shp"], {}),
        ("Gather", ["shp", "zero"], ["b"], {"axis": 0}),
        ("Unsqueeze", ["b", "ax0"], ["b1"], {}),
        ("Concat", ["b1", "neg1"], ["target"], {"axis": 0}),
        ("Reshape", ["x", "target"], ["flat"], {}),
        ("Slice", ["flat", "starts", "ends", "axes"], ["sl"], {}),
        ("Transpose", ["sl"], ["y"], {"perm": [1, 0]}),
    ]
    inits = {
        "zero": np.array(0, np.int64), "ax0": np.array([0], np.int64),
        "neg1": np.array([-1], np.int64),
        "starts": np.array([2], np.int64), "ends": np.array([9], np.int64),
        "axes": np.array([1], np.int64),
    }
    out = run_model(nodes, inits, ["x"], ["y"], {"x": x})[0]
    np.testing.assert_array_equal(out, x.reshape(2, -1)[:, 2:9].T)

    nodes = [("Split", ["x"], ["a", "b", "c"], {"axis": 1, "num_outputs": 3})]
    data = onnx_jax.build_model(nodes, {}, ["x"], ["a", "b", "c"])
    outs = onnx_jax.InferenceSession(data).run(None, {"x": x})
    for i, o in enumerate(outs):
        np.testing.assert_array_equal(o, x[:, i:i + 1])


def test_focus_slice_pattern():
    """YOLOX Focus: 4 strided Slices + Concat halve HW and 4x channels."""
    x = np.random.default_rng(4).standard_normal((1, 3, 8, 8)).astype(np.float32)
    nodes = []
    names = []
    for i, (r0, c0) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
        nodes.append(("Slice", ["x", f"s{i}", "big", "hw_axes", "two"],
                      [f"p{i}"], {}))
        names.append(f"p{i}")
    nodes.append(("Concat", names, ["y"], {"axis": 1}))
    inits = {"big": np.array([2**31, 2**31], np.int64),
             "hw_axes": np.array([2, 3], np.int64),
             "two": np.array([2, 2], np.int64)}
    for i, (r0, c0) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
        inits[f"s{i}"] = np.array([r0, c0], np.int64)
    out = run_model(nodes, inits, ["x"], ["y"], {"x": x})[0]
    expect = np.concatenate([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                             x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], axis=1)
    np.testing.assert_array_equal(out, expect)


def test_reductions_and_argmax():
    x = np.random.default_rng(5).standard_normal((3, 5, 7)).astype(np.float32)
    nodes = [("ReduceMean", ["x"], ["m"], {"axes": [2], "keepdims": 0}),
             ("ArgMax", ["m"], ["y"], {"axis": 1, "keepdims": 0})]
    out = run_model(nodes, {}, ["x"], ["y"], {"x": x})[0]
    np.testing.assert_array_equal(out, x.mean(axis=2).argmax(axis=1))


def test_simcc_head_through_session_api():
    """A DWPose-shaped SimCC tail (Conv 1x1 -> Flatten -> Gemm -> two output
    branches) driven through the ORT-compatible session API exactly as
    dwpose/onnx_infer.inference_pose uses it."""
    torch.manual_seed(6)
    conv = torch.nn.Conv2d(4, 13, 1).eval()
    fx = torch.nn.Linear(13 * 6 * 8, 13 * 12).eval()
    fy = torch.nn.Linear(13 * 6 * 8, 13 * 16).eval()
    x = torch.randn(1, 4, 6, 8)
    with torch.no_grad():
        h = conv(x).flatten(1)
        ref_x = fx(h).reshape(1, 13, 12).numpy()
        ref_y = fy(h).reshape(1, 13, 16).numpy()
    nodes = [
        ("Conv", ["input", "cw", "cb"], ["c"], {"kernel_shape": [1, 1]}),
        ("Flatten", ["c"], ["h"], {"axis": 1}),
        ("Gemm", ["h", "wx", "bx"], ["gx"], {"transB": 1}),
        ("Gemm", ["h", "wy", "by"], ["gy"], {"transB": 1}),
        ("Reshape", ["gx", "shx"], ["simcc_x"], {}),
        ("Reshape", ["gy", "shy"], ["simcc_y"], {}),
    ]
    inits = {"cw": conv.weight.detach().numpy(), "cb": conv.bias.detach().numpy(),
             "wx": fx.weight.detach().numpy(), "bx": fx.bias.detach().numpy(),
             "wy": fy.weight.detach().numpy(), "by": fy.bias.detach().numpy(),
             "shx": np.array([1, 13, 12], np.int64),
             "shy": np.array([1, 13, 16], np.int64)}
    data = onnx_jax.build_model(nodes, inits, ["input"], ["simcc_x", "simcc_y"])
    sess = onnx_jax.InferenceSession(data)
    assert [i.name for i in sess.get_inputs()] == ["input"]
    sx, sy = sess.run(None, {sess.get_inputs()[0].name: x.numpy()})
    np.testing.assert_allclose(sx, ref_x, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(sy, ref_y, rtol=2e-4, atol=2e-5)


def test_unknown_op_raises_with_name():
    data = onnx_jax.build_model([("NoSuchOp", ["x"], ["y"], {})], {}, ["x"], ["y"])
    sess = onnx_jax.InferenceSession(data)
    with pytest.raises(NotImplementedError, match="NoSuchOp"):
        sess.run(None, {"x": np.zeros(2, np.float32)})


def test_zero_valued_typed_attrs_proto3_omission():
    """Proto3 writers omit zero scalar fields: AttributeProto{name:'axis',
    type:INT} with no i field must parse as 0, not None (review r3)."""
    def ld(fno, payload):
        return bytes([fno << 3 | 2, len(payload)]) + payload

    # attr 'axis' INT with omitted i=0; Gather(x, idx) along axis 0
    attr = ld(1, b"axis") + bytes([0xA0, 0x01, 2])  # tag(20,varint)+INT(2)
    node = (ld(1, b"x") + ld(1, b"idx") + ld(2, b"y") + ld(4, b"Gather")
            + ld(5, attr))
    graph = (ld(1, node) + ld(11, ld(1, b"x")) + ld(11, ld(1, b"idx"))
             + ld(12, ld(1, b"y")))
    model = ld(7, graph)
    g = onnx_jax.parse_model(model)
    assert g.nodes[0].attrs["axis"] == 0
    sess = onnx_jax.InferenceSession(model)
    x = np.arange(6, dtype=np.float32).reshape(3, 2)
    out = sess.run(None, {"x": x, "idx": np.array([2, 0], np.int64)})[0]
    np.testing.assert_array_equal(out, x[[2, 0]])
    # FLOAT attr with omitted f=0.0
    attrf = ld(1, b"alpha") + bytes([0xA0, 0x01, 1])  # tag(20,varint)+FLOAT(1)
    name, val = onnx_jax._parse_attribute(memoryview(attrf))
    assert name == "alpha" and val == 0.0


def test_unsqueeze_negative_axes_and_split_default_outputs():
    # Unsqueeze axes=[-2,-1] on (2,3) must give (2,3,1,1) (spec: axes are
    # positions in the OUTPUT rank)
    x = np.zeros((2, 3), np.float32)
    out = run_model([("Unsqueeze", ["x"], ["y"], {"axes": [-2, -1]})],
                    {}, ["x"], ["y"], {"x": x})[0]
    assert out.shape == (2, 3, 1, 1)
    # Split with neither split sizes nor num_outputs: count = node outputs
    x = np.arange(12, dtype=np.float32).reshape(6, 2)
    outs = run_model([("Split", ["x"], ["a", "b", "c"], {"axis": 0})],
                     {}, ["x"], ["a", "b", "c"], {"x": x})
    assert [o.shape for o in outs] == [(2, 2), (2, 2), (2, 2)]
    np.testing.assert_array_equal(np.concatenate(outs, axis=0), x)


def test_resize_scales_floor_and_same_lower_conv_vs_torch():
    # Resize downscale: output dim = floor(in*scale) per spec (round() gave
    # off-by-one shapes, review r3): floor(3*0.6)=1
    x = np.ones((1, 1, 3, 3), np.float32)
    out = run_model(
        [("Resize", ["x", "", "scales"], ["y"], {"mode": b"linear"})],
        {"scales": np.array([1.0, 1.0, 0.6, 0.6], np.float32)},
        ["x"], ["y"], {"x": x})[0]
    assert out.shape == (1, 1, 1, 1)
    # SAME_LOWER: odd pad element goes BEFORE the input (torch can't express
    # auto_pad; compare against an explicitly pre-padded VALID conv)
    rng = np.random.default_rng(0)
    xx = rng.standard_normal((1, 2, 5, 5)).astype(np.float32)
    w = rng.standard_normal((3, 2, 2, 2)).astype(np.float32)
    got = run_model(
        [("Conv", ["x", "w"], ["y"],
          {"auto_pad": b"SAME_LOWER", "strides": [2, 2],
           "kernel_shape": [2, 2]})],
        {"w": w}, ["x"], ["y"], {"x": xx})[0]
    # out = ceil(5/2) = 3; total pad = (3-1)*2+2-5 = 1 -> (1,0) for LOWER
    xpad = np.pad(xx, ((0, 0), (0, 0), (1, 0), (1, 0)))
    want = torch.nn.functional.conv2d(torch.from_numpy(xpad),
                                      torch.from_numpy(w), stride=2).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
