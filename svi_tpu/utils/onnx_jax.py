"""Minimal ONNX-to-JAX executor (no onnxruntime, no onnx package).

The reference runs DWPose preprocessing through onnxruntime's CUDA EP
(dwpose/wholebody.py:8-17). This image ships neither onnxruntime nor the
`onnx` python package, so this module implements the two pieces needed to run
those ONNX graphs natively on the JAX backend (TPU or CPU):

  1. a protobuf *wire-format* parser for the ONNX ModelProto subset that
     CNN checkpoints use (graph/node/initializer/attribute/tensor) — protobuf
     wire format is a stable, documented encoding (tag = field<<3 | wiretype;
     varint / 64-bit / length-delimited / 32-bit), so no schema compiler is
     needed;
  2. an eager graph interpreter where tensor math runs as jax.numpy ops
     (XLA-compiled per op) and shape/index plumbing (Shape, Gather-on-shapes,
     Reshape targets, Slice bounds) is evaluated concretely on host.

`InferenceSession` mirrors the small part of onnxruntime's API that
dwpose/onnx_infer.py uses (`get_inputs`, `run`), so DWPose extraction works
unchanged with this as the fallback engine.

Covered op set: what YOLOX-L and RTMPose/DWPose SimCC exports contain
(Conv/ConvTranspose, BatchNormalization, activations incl. Sigmoid+Mul SiLU
pairs, pooling, Resize, Gemm/MatMul, Reduce*, Softmax/ArgMax, and the shape
plumbing ops). Unknown ops raise with the op name so gaps are explicit.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


# ---------------------------------------------------------------------------
# protobuf wire-format primitives
# ---------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a serialized message.
    value: int for varint(0)/fixed(1,5), memoryview for length-delimited(2)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = bytes(buf[pos:pos + 8])
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = bytes(buf[pos:pos + 4])
            pos += 4
        else:  # wire types 3/4 (groups) don't appear in onnx
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, val


def _packed_ints(val) -> list:
    if isinstance(val, int):
        return [val]
    out = []
    pos = 0
    while pos < len(val):
        v, pos = _read_varint(val, pos)
        out.append(v)
    return out


def _signed(v: int) -> int:
    """protobuf int64 varints are two's-complement in 64 bits."""
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# ONNX message parsing (ModelProto subset)
# ---------------------------------------------------------------------------

# TensorProto.DataType -> numpy dtype
_ONNX_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _parse_tensor(buf: memoryview) -> tuple:
    """TensorProto -> (name, np.ndarray)."""
    dims, dtype, name = [], 1, ""
    raw = None
    floats, ints32, ints64, doubles = [], [], [], []
    for fno, wt, val in _iter_fields(buf):
        if fno == 1:  # dims (repeated int64)
            dims += [_signed(v) for v in _packed_ints(val)]
        elif fno == 2:  # data_type
            dtype = val
        elif fno == 8:  # name
            name = bytes(val).decode("utf-8")
        elif fno == 9:  # raw_data
            raw = bytes(val)
        elif fno == 4:  # float_data (packed or repeated fixed32)
            if wt == 5:
                floats.append(struct.unpack("<f", val)[0])
            else:
                floats += [x[0] for x in struct.iter_unpack("<f", bytes(val))]
        elif fno == 5:  # int32_data
            ints32 += [_signed(v) for v in _packed_ints(val)]
        elif fno == 7:  # int64_data
            ints64 += [_signed(v) for v in _packed_ints(val)]
        elif fno == 10:  # double_data
            if wt == 1:
                doubles.append(struct.unpack("<d", val)[0])
            else:
                doubles += [x[0] for x in struct.iter_unpack("<d", bytes(val))]
    np_dtype = _ONNX_DTYPES.get(dtype, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=np_dtype)
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif doubles:
        arr = np.asarray(doubles, np.float64)
    elif ints64:
        arr = np.asarray(ints64, np.int64)
    elif ints32:
        # int32_data also carries (u)int8/16/bool payloads
        arr = np.asarray(ints32).astype(np_dtype)
    else:
        arr = np.zeros(0, np_dtype)
    return name, arr.reshape(dims) if dims else arr.reshape(())


def _parse_attribute(buf: memoryview) -> tuple:
    """AttributeProto -> (name, value).

    Proto3 writers omit zero-valued scalar fields (i=0, f=0.0, s=b""), so a
    missing payload is disambiguated through the AttributeProto.type field
    (fno 20): a typed INT attribute with no i field IS the value 0, not an
    absent attribute."""
    name, value = "", None
    f_val = i_val = s_val = t_val = None
    a_type = None  # AttributeProto.AttributeType (fno 20)
    floats, ints, strings = [], [], []
    for fno, wt, val in _iter_fields(buf):
        if fno == 1:
            name = bytes(val).decode("utf-8")
        elif fno == 2:  # f (fixed32)
            f_val = struct.unpack("<f", val)[0]
        elif fno == 3:  # i
            i_val = _signed(val)
        elif fno == 4:  # s
            s_val = bytes(val)
        elif fno == 5:  # t (tensor)
            t_val = _parse_tensor(val)[1]
        elif fno == 7:  # floats
            if wt == 5:
                floats.append(struct.unpack("<f", val)[0])
            else:
                floats += [x[0] for x in struct.iter_unpack("<f", bytes(val))]
        elif fno == 8:  # ints
            ints += [_signed(v) for v in _packed_ints(val)]
        elif fno == 9:  # strings
            strings.append(bytes(val))
        elif fno == 20:  # type
            a_type = val if isinstance(val, int) else int(val)
    # 1=FLOAT 2=INT 3=STRING 4=TENSOR 6=FLOATS 7=INTS 8=STRINGS
    if a_type == 1:
        return name, f_val if f_val is not None else 0.0
    if a_type == 2:
        return name, i_val if i_val is not None else 0
    if a_type == 3:
        return name, s_val if s_val is not None else b""
    if a_type == 4:
        return name, t_val
    if a_type == 6:
        return name, floats
    if a_type == 7:
        return name, ints
    if a_type == 8:
        return name, strings
    for v in (t_val, s_val, f_val, i_val):
        if v is not None:
            value = v
            break
    if value is None:
        value = floats or ints or strings or None
    return name, value


@dataclass
class _Node:
    op_type: str
    inputs: list
    outputs: list
    attrs: dict = field(default_factory=dict)
    name: str = ""


@dataclass
class Graph:
    nodes: list
    initializers: dict
    inputs: list   # runtime input names (initializers excluded)
    outputs: list


def _parse_graph(buf: memoryview) -> Graph:
    nodes, initializers, inputs, outputs = [], {}, [], []
    for fno, _wt, val in _iter_fields(buf):
        if fno == 1:  # node
            n = _Node("", [], [])
            for nf, _nwt, nval in _iter_fields(val):
                if nf == 1:
                    n.inputs.append(bytes(nval).decode("utf-8"))
                elif nf == 2:
                    n.outputs.append(bytes(nval).decode("utf-8"))
                elif nf == 3:
                    n.name = bytes(nval).decode("utf-8")
                elif nf == 4:
                    n.op_type = bytes(nval).decode("utf-8")
                elif nf == 5:
                    k, v = _parse_attribute(nval)
                    n.attrs[k] = v
            nodes.append(n)
        elif fno == 5:  # initializer
            name, arr = _parse_tensor(val)
            initializers[name] = arr
        elif fno in (11, 12):  # input / output ValueInfoProto
            vi_name = ""
            for vf, _vwt, vval in _iter_fields(val):
                if vf == 1:
                    vi_name = bytes(vval).decode("utf-8")
                    break
            (inputs if fno == 11 else outputs).append(vi_name)
    inputs = [n for n in inputs if n not in initializers]
    return Graph(nodes, initializers, inputs, outputs)


def parse_model(data: bytes) -> Graph:
    """ONNX ModelProto bytes -> Graph (field 7 = graph)."""
    for fno, _wt, val in _iter_fields(memoryview(data)):
        if fno == 7:
            return _parse_graph(val)
    raise ValueError("no GraphProto (field 7) found — not an ONNX ModelProto?")


# ---------------------------------------------------------------------------
# graph interpreter
# ---------------------------------------------------------------------------


def _pair_pads(pads, ndim_spatial):
    """ONNX pads [b1..bn, e1..en] -> ((b1,e1),...)"""
    pads = list(pads or [0] * (2 * ndim_spatial))
    return tuple((int(pads[i]), int(pads[i + ndim_spatial]))
                 for i in range(ndim_spatial))


def _np(x):
    return np.asarray(x)


class _Executor:
    def __init__(self, graph: Graph):
        import jax.numpy as jnp

        self.g = graph
        self.jnp = jnp
        self.weights = {k: jnp.asarray(v) if v.dtype != np.int64 else v
                        for k, v in graph.initializers.items()}

    # -- op impls -----------------------------------------------------------

    def run(self, feeds: dict) -> dict:
        import jax
        import jax.numpy as jnp

        env = dict(self.weights)
        for k, v in feeds.items():
            env[k] = jnp.asarray(v)
        for node in self.g.nodes:
            fn = getattr(self, f"op_{node.op_type}", None)
            if fn is None:
                raise NotImplementedError(
                    f"ONNX op '{node.op_type}' not implemented in onnx_jax "
                    f"(node '{node.name}')")
            args = [env[i] if i else None for i in node.inputs]
            out = fn(node, *args)
            if not isinstance(out, tuple):
                out = (out,)
            for name, val in zip(node.outputs, out):
                if name:
                    env[name] = val
        return {o: env[o] for o in self.g.outputs}

    # convolution / linear ---------------------------------------------------

    def op_Conv(self, node, x, w, b=None):
        import jax

        a = node.attrs
        nsp = x.ndim - 2
        strides = tuple(a.get("strides", [1] * nsp))
        dilations = tuple(a.get("dilations", [1] * nsp))
        group = int(a.get("group", 1))
        auto_pad = a.get("auto_pad", b"NOTSET")
        if auto_pad in (b"SAME_UPPER", b"SAME_LOWER"):
            # ONNX SAME_LOWER puts the odd pad element BEFORE the input; lax
            # "SAME" is SAME_UPPER (extra pad after), so build explicit pads
            padding = []
            for i in range(nsp):
                k_eff = (w.shape[2 + i] - 1) * dilations[i] + 1
                out = -(-x.shape[2 + i] // strides[i])  # ceil
                total = max(0, (out - 1) * strides[i] + k_eff - x.shape[2 + i])
                lo, hi = total // 2, total - total // 2
                padding.append((hi, lo) if auto_pad == b"SAME_LOWER" else (lo, hi))
            padding = tuple(padding)
        else:
            padding = _pair_pads(a.get("pads"), nsp)
        dn = ("NCHW", "OIHW", "NCHW") if nsp == 2 else (
            ("NCW", "OIW", "NCW") if nsp == 1 else ("NCDHW", "OIDHW", "NCDHW"))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            rhs_dilation=dilations, dimension_numbers=dn,
            feature_group_count=group)
        if b is not None:
            y = y + b.reshape((1, -1) + (1,) * nsp)
        return y

    def op_ConvTranspose(self, node, x, w, b=None):
        import jax

        a = node.attrs
        nsp = x.ndim - 2
        strides = tuple(a.get("strides", [1] * nsp))
        pads = _pair_pads(a.get("pads"), nsp)
        # ONNX ConvTranspose pads crop the output: lax transpose padding is
        # (k-1-p) on each side for the equivalent fractionally-strided conv
        kshape = w.shape[2:]
        lax_pads = tuple((int(kshape[i]) - 1 - pads[i][0],
                          int(kshape[i]) - 1 - pads[i][1]) for i in range(nsp))
        dn = ("NCHW", "OIHW", "NCHW") if nsp == 2 else ("NCW", "OIW", "NCW")
        # weight layout (in, out, *k) -> flip spatial, swap io
        wt = self.jnp.flip(w, axis=tuple(range(2, w.ndim))).swapaxes(0, 1)
        y = jax.lax.conv_general_dilated(
            x, wt, window_strides=(1,) * nsp, padding=lax_pads,
            lhs_dilation=strides, dimension_numbers=dn)
        if b is not None:
            y = y + b.reshape((1, -1) + (1,) * nsp)
        return y

    def op_Gemm(self, node, a_in, b_in, c_in=None):
        a = node.attrs
        x = a_in.T if a.get("transA", 0) else a_in
        w = b_in.T if a.get("transB", 0) else b_in
        y = (x @ w) * a.get("alpha", 1.0)
        if c_in is not None:
            y = y + c_in * a.get("beta", 1.0)
        return y

    def op_MatMul(self, node, x, w):
        return x @ w

    # normalization / activations -------------------------------------------

    def op_BatchNormalization(self, node, x, scale, b, mean, var):
        eps = node.attrs.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = self.jnp.reciprocal(self.jnp.sqrt(var + eps))
        return (x - mean.reshape(shape)) * (inv * scale).reshape(shape) + b.reshape(shape)

    def op_Relu(self, node, x):
        return self.jnp.maximum(x, 0)

    def op_LeakyRelu(self, node, x):
        return self.jnp.where(x >= 0, x, x * node.attrs.get("alpha", 0.01))

    def op_Sigmoid(self, node, x):
        import jax

        return jax.nn.sigmoid(x)

    def op_HardSigmoid(self, node, x):
        alpha = node.attrs.get("alpha", 0.2)
        beta = node.attrs.get("beta", 0.5)
        return self.jnp.clip(x * alpha + beta, 0, 1)

    def op_Tanh(self, node, x):
        return self.jnp.tanh(x)

    def op_Erf(self, node, x):
        import jax

        return jax.scipy.special.erf(x)

    def op_Softmax(self, node, x):
        import jax

        return jax.nn.softmax(x, axis=node.attrs.get("axis", -1))

    def op_Exp(self, node, x):
        return self.jnp.exp(x)

    def op_Log(self, node, x):
        return self.jnp.log(x)

    def op_Sqrt(self, node, x):
        return self.jnp.sqrt(x)

    def op_Pow(self, node, x, y):
        return x ** y

    def op_Neg(self, node, x):
        return -x

    def op_Abs(self, node, x):
        return self.jnp.abs(x)

    def op_Floor(self, node, x):
        return self.jnp.floor(x)

    def op_Clip(self, node, x, lo=None, hi=None):
        a = node.attrs
        lo = a.get("min") if lo is None else lo
        hi = a.get("max") if hi is None else hi
        return self.jnp.clip(x, lo, hi)

    # elementwise binary -----------------------------------------------------

    def op_Add(self, node, x, y):
        return x + y

    def op_Sub(self, node, x, y):
        return x - y

    def op_Mul(self, node, x, y):
        return x * y

    def op_Div(self, node, x, y):
        return x / y

    def op_Equal(self, node, x, y):
        return x == y

    def op_Greater(self, node, x, y):
        return x > y

    def op_Less(self, node, x, y):
        return x < y

    def op_Where(self, node, c, x, y):
        return self.jnp.where(c, x, y)

    def op_Max(self, node, *xs):
        out = xs[0]
        for x in xs[1:]:
            out = self.jnp.maximum(out, x)
        return out

    def op_Min(self, node, *xs):
        out = xs[0]
        for x in xs[1:]:
            out = self.jnp.minimum(out, x)
        return out

    # pooling ----------------------------------------------------------------

    def _pool(self, node, x, reducer, init):
        import jax

        a = node.attrs
        k = tuple(a["kernel_shape"])
        nsp = len(k)
        strides = tuple(a.get("strides", [1] * nsp))
        pads = _pair_pads(a.get("pads"), nsp)
        if a.get("ceil_mode", 0):
            # emulate ceil by growing end pads so every window fits
            new_pads = []
            for i in range(nsp):
                size = x.shape[2 + i] + pads[i][0] + pads[i][1]
                rem = (size - k[i]) % strides[i]
                extra = (strides[i] - rem) % strides[i] if rem else 0
                new_pads.append((pads[i][0], pads[i][1] + extra))
            pads = tuple(new_pads)
        window = (1, 1) + k
        wstrides = (1, 1) + strides
        wpads = ((0, 0), (0, 0)) + pads
        y = jax.lax.reduce_window(x, init, reducer, window, wstrides, wpads)
        return y

    def op_MaxPool(self, node, x):
        import jax

        return self._pool(node, x, jax.lax.max, -self.jnp.inf)

    def op_AveragePool(self, node, x):
        import jax

        s = self._pool(node, x, jax.lax.add, 0.0)
        a = node.attrs
        k = tuple(a["kernel_shape"])
        if a.get("count_include_pad", 0) or not any(
                p for pr in _pair_pads(a.get("pads"), len(k)) for p in pr):
            return s / float(np.prod(k))
        ones = self.jnp.ones_like(x)
        cnt = self._pool(node, ones, jax.lax.add, 0.0)
        return s / cnt

    def op_GlobalAveragePool(self, node, x):
        return x.mean(axis=tuple(range(2, x.ndim)), keepdims=True)

    def op_GlobalMaxPool(self, node, x):
        return x.max(axis=tuple(range(2, x.ndim)), keepdims=True)

    # resize -----------------------------------------------------------------

    def op_Resize(self, node, x, roi=None, scales=None, sizes=None):
        import jax

        a = node.attrs
        mode = a.get("mode", b"nearest").decode() if isinstance(
            a.get("mode", b"nearest"), bytes) else a.get("mode", "nearest")
        if sizes is not None and _np(sizes).size:
            out_shape = tuple(int(v) for v in _np(sizes))
        else:
            sc = _np(scales)
            # ONNX spec: output_size = floor(input_size * scale)
            out_shape = tuple(int(np.floor(s * f)) for s, f in zip(x.shape, sc))
        if mode == "nearest":
            ct = a.get("coordinate_transformation_mode", b"half_pixel")
            ct = ct.decode() if isinstance(ct, bytes) else ct
            # integer upscale (the CNN upsample case): exact via repeat
            if all(o % i == 0 for o, i in zip(out_shape[2:], x.shape[2:])) \
                    and ct in ("asymmetric", "half_pixel"):
                y = x
                for d in range(2, x.ndim):
                    y = self.jnp.repeat(y, out_shape[d] // x.shape[d], axis=d)
                return y
            method = "nearest"
        else:
            method = "linear" if mode in ("linear", "bilinear") else "cubic"
        return jax.image.resize(x, out_shape, method=method)

    def op_Upsample(self, node, x, scales=None):
        if scales is None:
            scales = node.attrs.get("scales")
        node.attrs.setdefault("mode", b"nearest")
        return self.op_Resize(node, x, None, self.jnp.asarray(_np(scales)), None)

    # shape plumbing (host-side concrete values) ----------------------------

    def op_Shape(self, node, x):
        return np.asarray(x.shape, np.int64)

    def op_Size(self, node, x):
        return np.asarray(int(np.prod(x.shape)), np.int64)

    def op_Constant(self, node):
        a = node.attrs
        if "value" in a:
            v = a["value"]
            return v if isinstance(v, np.ndarray) else np.asarray(v)
        for k in ("value_float", "value_int"):
            if k in a:
                return np.asarray(a[k])
        if "value_floats" in a:
            return np.asarray(a["value_floats"], np.float32)
        if "value_ints" in a:
            return np.asarray(a["value_ints"], np.int64)
        raise NotImplementedError("Constant without value")

    def op_ConstantOfShape(self, node, shape):
        v = node.attrs.get("value", np.zeros(1, np.float32))
        return np.full(tuple(int(s) for s in _np(shape)), _np(v).ravel()[0],
                       _np(v).dtype)

    def op_Range(self, node, start, limit, delta):
        return np.arange(int(_np(start)), int(_np(limit)), int(_np(delta)),
                         dtype=_np(start).dtype)

    def op_Cast(self, node, x):
        return x.astype(_ONNX_DTYPES[node.attrs["to"]])

    def op_Gather(self, node, x, idx):
        axis = node.attrs.get("axis", 0)
        if isinstance(x, np.ndarray):
            return np.take(x, _np(idx).astype(np.int64), axis=axis)
        return self.jnp.take(x, self.jnp.asarray(_np(idx)), axis=axis)

    def op_Reshape(self, node, x, shape):
        target = [int(s) for s in _np(shape)]
        if not node.attrs.get("allowzero", 0):
            target = [x.shape[i] if s == 0 else s for i, s in enumerate(target)]
        return x.reshape(target)

    def op_Flatten(self, node, x):
        axis = node.attrs.get("axis", 1)
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        return x.reshape(lead, -1)

    def op_Transpose(self, node, x):
        perm = node.attrs.get("perm")
        if perm is None:
            perm = list(range(x.ndim))[::-1]
        return x.transpose(tuple(perm))

    def op_Squeeze(self, node, x, axes=None):
        if axes is None:
            axes = node.attrs.get("axes")
        if axes is None:
            return x.reshape([s for s in x.shape if s != 1])
        axes = sorted(int(a) % x.ndim for a in _np(axes).ravel())
        return x.reshape([s for i, s in enumerate(x.shape) if i not in axes])

    def op_Unsqueeze(self, node, x, axes=None):
        if axes is None:
            axes = node.attrs.get("axes")
        # axes are positions in the OUTPUT rank (spec): resolve negatives
        # against the final rank first, then insert ascending
        out_rank = x.ndim + len(_np(axes).ravel())
        axes = sorted(int(a) % out_rank for a in _np(axes).ravel())
        shape = list(x.shape)
        for a in axes:
            shape.insert(a, 1)
        return x.reshape(shape)

    def op_Concat(self, node, *xs):
        axis = node.attrs["axis"]
        if all(isinstance(x, np.ndarray) for x in xs):
            return np.concatenate(xs, axis=axis)
        return self.jnp.concatenate([self.jnp.asarray(_np(x)) for x in xs],
                                    axis=axis)

    def op_Split(self, node, x, split=None):
        axis = node.attrs.get("axis", 0)
        if split is None:
            split = node.attrs.get("split")
        if split is None:
            # with no sizes and no num_outputs attr the split count is the
            # node's output count (pre-opset-18 behavior); uneven dims give
            # ceil-sized chunks with a smaller last chunk (opset-18 rule)
            n = node.attrs.get("num_outputs") or len(node.outputs)
            chunk = -(-x.shape[axis] // n)
            sizes = [chunk] * (n - 1) + [x.shape[axis] - chunk * (n - 1)]
        else:
            sizes = [int(s) for s in _np(split).ravel()]
        out, start = [], 0
        for s in sizes:
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(start, start + s)
            out.append(x[tuple(idx)])
            start += s
        return tuple(out)

    def op_Slice(self, node, x, starts=None, ends=None, axes=None, steps=None):
        a = node.attrs
        starts = _np(a["starts"] if starts is None else starts).ravel()
        ends = _np(a["ends"] if ends is None else ends).ravel()
        if axes is None:
            axes = a.get("axes", list(range(len(starts))))
        axes = _np(axes).ravel()
        steps = _np([1] * len(starts) if steps is None else steps).ravel()
        idx = [slice(None)] * x.ndim
        for s, e, ax, st in zip(starts, ends, axes, steps):
            s, e, ax, st = int(s), int(e), int(ax) % x.ndim, int(st)
            # onnx encodes "to the end" as INT64_MAX (huge values clip)
            e = min(e, x.shape[ax]) if st > 0 else max(e, -x.shape[ax] - 1)
            idx[ax] = slice(s, e, st)
        return x[tuple(idx)]

    def op_Expand(self, node, x, shape):
        target = tuple(int(s) for s in _np(shape))
        return self.jnp.broadcast_to(
            x, np.broadcast_shapes(tuple(x.shape), target))

    def op_Tile(self, node, x, repeats):
        return self.jnp.tile(x, tuple(int(r) for r in _np(repeats)))

    def op_Pad(self, node, x, pads=None, value=None):
        a = node.attrs
        pads = _np(a["pads"] if pads is None else pads).ravel()
        n = x.ndim
        pairs = tuple((int(pads[i]), int(pads[i + n])) for i in range(n))
        cval = float(_np(value)) if value is not None else a.get("value", 0.0)
        mode = a.get("mode", b"constant")
        mode = mode.decode() if isinstance(mode, bytes) else mode
        if mode == "constant":
            return self.jnp.pad(x, pairs, constant_values=cval)
        return self.jnp.pad(x, pairs, mode={"reflect": "reflect",
                                            "edge": "edge"}[mode])

    def op_Identity(self, node, x):
        return x

    def op_Dropout(self, node, x):
        return x

    # reductions -------------------------------------------------------------

    def _axes(self, node, x, axes_in):
        axes = node.attrs.get("axes") if axes_in is None else [
            int(a) for a in _np(axes_in).ravel()]
        if axes is None:
            return None
        return tuple(int(a) % x.ndim for a in axes)

    def op_ReduceMean(self, node, x, axes=None):
        return x.mean(axis=self._axes(node, x, axes),
                      keepdims=bool(node.attrs.get("keepdims", 1)))

    def op_ReduceSum(self, node, x, axes=None):
        return x.sum(axis=self._axes(node, x, axes),
                     keepdims=bool(node.attrs.get("keepdims", 1)))

    def op_ReduceMax(self, node, x, axes=None):
        return x.max(axis=self._axes(node, x, axes),
                     keepdims=bool(node.attrs.get("keepdims", 1)))

    def op_ReduceMin(self, node, x, axes=None):
        return x.min(axis=self._axes(node, x, axes),
                     keepdims=bool(node.attrs.get("keepdims", 1)))

    def op_ArgMax(self, node, x):
        axis = node.attrs.get("axis", 0)
        y = x.argmax(axis=axis)
        if node.attrs.get("keepdims", 1):
            y = self.jnp.expand_dims(y, axis)
        # onnx ArgMax yields int64; jnp is int32 without x64 — lift on host
        return np.asarray(y, np.int64)


class _IOInfo:
    def __init__(self, name):
        self.name = name
        self.shape = None
        self.type = None


class InferenceSession:
    """onnxruntime.InferenceSession-compatible facade over the JAX executor
    (the subset dwpose/onnx_infer.py uses: get_inputs()/get_outputs()/run)."""

    def __init__(self, path_or_bytes, providers=None):  # providers ignored
        if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
            data = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, "rb") as f:
                data = f.read()
        self.graph = parse_model(data)
        self._exec = _Executor(self.graph)

    def get_inputs(self):
        return [_IOInfo(n) for n in self.graph.inputs]

    def get_outputs(self):
        return [_IOInfo(n) for n in self.graph.outputs]

    def run(self, output_names, feeds: dict):
        out = self._exec.run(feeds)
        names = output_names or self.graph.outputs
        # copy: initializer-backed outputs can be read-only frombuffer views,
        # and ORT callers (dwpose/onnx_infer._yolox_decode) mutate in place
        return [np.array(out[n]) for n in names]


# ---------------------------------------------------------------------------
# minimal writer (tests + tooling): build ModelProto bytes from a dict spec
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fno: int, wt: int) -> bytes:
    return _varint((fno << 3) | wt)


def _ld(fno: int, payload: bytes) -> bytes:
    return _tag(fno, 2) + _varint(len(payload)) + payload


_NP_TO_ONNX = {np.dtype(np.float32): 1, np.dtype(np.uint8): 2,
               np.dtype(np.int8): 3, np.dtype(np.int32): 6,
               np.dtype(np.int64): 7, np.dtype(np.bool_): 9,
               np.dtype(np.float16): 10, np.dtype(np.float64): 11}


def _encode_tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    out = b""
    for d in arr.shape:
        out += _tag(1, 0) + _varint(d)
    out += _tag(2, 0) + _varint(_NP_TO_ONNX[arr.dtype])
    out += _ld(8, name.encode())
    out += _ld(9, arr.tobytes())
    return out


def _encode_attr(name: str, value) -> bytes:
    out = _ld(1, name.encode())
    if isinstance(value, bytes):
        out += _ld(4, value) + _tag(20, 0) + _varint(3)  # STRING
    elif isinstance(value, str):
        out += _ld(4, value.encode()) + _tag(20, 0) + _varint(3)
    elif isinstance(value, float):
        out += _tag(2, 5) + struct.pack("<f", value) + _tag(20, 0) + _varint(1)
    elif isinstance(value, (int, np.integer)):
        out += _tag(3, 0) + _varint(int(value)) + _tag(20, 0) + _varint(2)
    elif isinstance(value, np.ndarray):
        out += _ld(5, _encode_tensor("", value)) + _tag(20, 0) + _varint(4)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, (int, np.integer)) for v in value):
            for v in value:
                out += _tag(8, 0) + _varint(int(v))
            out += _tag(20, 0) + _varint(7)  # INTS
        else:
            for v in value:
                out += _tag(7, 5) + struct.pack("<f", float(v))
            out += _tag(20, 0) + _varint(6)  # FLOATS
    else:
        raise TypeError(f"unsupported attr {name}={value!r}")
    return out


def build_model(nodes, initializers: dict, inputs, outputs) -> bytes:
    """nodes: [(op_type, [in], [out], {attrs})]; returns ModelProto bytes.
    Used by the tests (round-trip through the parser) and as tooling for
    synthesizing fixtures without the onnx package."""
    g = b""
    for op_type, ins, outs, attrs in nodes:
        n = b""
        for i in ins:
            n += _ld(1, i.encode())
        for o in outs:
            n += _ld(2, o.encode())
        n += _ld(4, op_type.encode())
        for k, v in (attrs or {}).items():
            n += _ld(5, _encode_attr(k, v))
        g += _ld(1, n)
    for name, arr in initializers.items():
        g += _ld(5, _encode_tensor(name, arr))
    for i in inputs:
        g += _ld(11, _ld(1, i.encode()))
    for o in outputs:
        g += _ld(12, _ld(1, o.encode()))
    # ModelProto: ir_version(1) + graph(7) + opset_import(8, version 17)
    opset = _tag(2, 0) + _varint(17)
    return _tag(1, 0) + _varint(8) + _ld(7, g) + _ld(8, opset)
