"""ONNX graph executor: run a parsed graph directly as a jittable JAX fn.

This is the graph-driven import path: instead of hoping a hand-written
architecture matches the released file (and zipping weights by node order),
the graph itself IS the model — every op is translated 1:1, so numerical
agreement with the file is by construction. The reference runs the same
graphs through onnxruntime (/root/reference/models/scrfd.py:59-61,83;
models/arcface.py:18-21,51); here they lower to XLA and fuse like any other
TPU program.

TPU-first translation rules:
- Feature maps live in NHWC (the TPU conv layout); conv kernels are
  converted OIHW->HWIO once at load. Ops that depend on NCHW semantics
  (Reshape/Flatten/Transpose/Shape/Slice/Softmax over axis 1, ...) see the
  tensor converted back to NCHW: parity beats elegance at these seams, and
  XLA fuses the transposes into the adjacent ops.
- Shape-computation chains (Shape -> Gather -> Unsqueeze -> Concat ->
  Reshape) are constant-folded at trace time: input shapes are static under
  jit, so these never become device ops.
- Inference semantics: BatchNormalization uses stored statistics, Dropout
  is identity.

Use `OnnxModel(graph)` (or `onnx_model(path)`): `.variables` is the weight
pytree, `.apply(variables, x_nhwc)` returns the graph outputs in declared
order (feature-map outputs as NCHW-semantics arrays, matching onnxruntime).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from .onnx_proto import OnnxGraph, OnnxNode, load_onnx

# ---------------------------------------------------------------------------
# Tagged values: ("nhwc", arr) for conv-layout feature maps, ("raw", arr)
# for everything else (raw == ONNX's own layout, i.e. NCHW for 4-D maps).
# Constants are plain numpy arrays (foldable at trace time).


def _to_raw(tag, x, jnp):
    if tag == "nhwc":
        return jnp.transpose(x, (0, 3, 1, 2))
    return x


def _to_nhwc(tag, x, jnp):
    if tag == "raw":
        return jnp.transpose(x, (0, 2, 3, 1))
    return x


def _const(v) -> Optional[np.ndarray]:
    return v if isinstance(v, np.ndarray) else None


class UnsupportedOp(ValueError):
    pass


# Every op type the executor can dispatch (the union of the branches in
# GraphExecutor.apply and the static-shape mini-interpreter). Preflight
# (models/preflight.py) scans release files against this set so an
# unsupported op fails the sign-off with a NAMED diagnosis up front,
# instead of an UnsupportedOp traceback mid-parity.
SUPPORTED_OPS = frozenset({
    "Conv", "BatchNormalization", "InstanceNormalization", "PRelu",
    "Relu", "LeakyRelu", "Sigmoid", "Exp", "Tanh", "Sqrt", "Neg", "Abs",
    "Softplus", "Erf", "HardSigmoid", "HardSwish", "Identity", "Dropout",
    "Add", "Sub", "Mul", "Div", "Pow", "Min", "Max", "Concat", "Constant",
    "MaxPool", "AveragePool", "GlobalAveragePool", "Resize", "Upsample",
    "Shape", "Reshape", "Flatten", "Squeeze", "Unsqueeze", "Transpose",
    "Slice", "Gather", "Split", "Expand", "Softmax", "ReduceMean",
    "ReduceSum", "Cast", "Clip", "MatMul", "Gemm", "Where", "Equal",
    "Greater", "Less", "ConstantOfShape", "Range",
})


def _pair(v, default=(1, 1)):
    if v is None:
        return default
    if isinstance(v, (int, np.integer)):
        return (int(v), int(v))
    return tuple(int(i) for i in v)


def _resolve_pads(attrs, in_hw, kernel, strides, dilations):
    """((top, bottom), (left, right)) honoring ONNX auto_pad.

    NOTSET -> explicit 'pads' [t, l, b, r]; VALID -> zero;
    SAME_UPPER/SAME_LOWER -> pad so out = ceil(in/stride), extra on the
    end/begin side respectively (ONNX Conv spec).
    """
    auto = attrs.get("auto_pad", b"NOTSET")
    if isinstance(auto, bytes):
        auto = auto.decode()
    if auto in ("NOTSET", ""):
        pads = attrs.get("pads", [0, 0, 0, 0])
        if isinstance(pads, (int, np.integer)):
            pads = [int(pads)] * 4
        return ((int(pads[0]), int(pads[2])), (int(pads[1]), int(pads[3])))
    if auto == "VALID":
        return ((0, 0), (0, 0))
    if auto in ("SAME_UPPER", "SAME_LOWER"):
        out = []
        for size, k, s, d in zip(in_hw, kernel, strides, dilations):
            eff_k = (k - 1) * d + 1
            n_out = -(-int(size) // s)
            total = max((n_out - 1) * s + eff_k - int(size), 0)
            small, big = total // 2, total - total // 2
            out.append((small, big) if auto == "SAME_UPPER"
                       else (big, small))
        return tuple(out)
    raise UnsupportedOp(f"auto_pad={auto!r}")


class OnnxModel:
    """Jit-compatible executor for one ONNX graph.

    >>> m = onnx_model("det_10g.onnx")
    >>> outs = jax.jit(m.apply)(m.variables, x_nhwc)   # list, declared order
    """

    def __init__(self, graph: OnnxGraph, dtype: Any = None):
        import jax.numpy as jnp

        self.graph = graph
        self.dtype = dtype or jnp.float32
        # f32 graphs default to exact f32 MXU passes (TPU's default conv
        # precision is bf16-grade and costs ~1e-2 abs on deep CNNs — beyond
        # the parity budget); bf16 graphs take the fast path.
        import jax
        self.precision = (jax.lax.Precision.HIGHEST
                          if self.dtype == jnp.float32 else None)
        self.input_name = self._data_input()
        weights: Dict[str, np.ndarray] = {}
        for name, arr in graph.initializers.items():
            if self._is_conv_kernel(name):
                arr = np.ascontiguousarray(np.transpose(arr, (2, 3, 1, 0)))
            weights[name] = arr
        self.variables = {"weights": weights}

    # ------------------------------------------------------------- helpers

    def _data_input(self) -> str:
        inits = self.graph.initializers
        for name in self.graph.inputs:
            if name not in inits:
                return name
        raise ValueError("graph has no non-initializer input")

    @functools.cached_property
    def _conv_kernel_names(self) -> set:
        return {n.inputs[1] for n in self.graph.nodes if n.op_type == "Conv"
                and len(n.inputs) > 1}

    def _is_conv_kernel(self, name: str) -> bool:
        return name in self._conv_kernel_names

    # --------------------------------------------------------------- apply

    def apply(self, variables, x, shape_out: Optional[Dict] = None):
        """x: (B, H, W, C) NHWC. Returns list of outputs (declared order).

        shape_out: optional dict filled with {tensor: (tag, raw_shape)} —
        raw_shape is the tensor's ONNX-semantics (NCHW) shape."""
        import jax.numpy as jnp

        w = variables["weights"]
        env: Dict[str, Tuple[str, Any]] = {}
        env[self.input_name] = ("nhwc", x.astype(self.dtype))
        for name, arr in w.items():
            env[name] = ("w", arr)

        for node in self.graph.nodes:
            self._exec(node, env, jnp)
            if shape_out is not None:
                for o in node.outputs:
                    if o in env:
                        tag, val = env[o]
                        shp = tuple(np.shape(val))
                        if tag == "nhwc" and len(shp) == 4:
                            shp = (shp[0], shp[3], shp[1], shp[2])
                        shape_out[o] = (tag, shp)

        outs = []
        for name in self.graph.outputs:
            tag, val = env[name]
            outs.append(_to_raw(tag, val, jnp).astype(jnp.float32)
                        if not isinstance(val, np.ndarray) else val)
        return outs

    def trace_shapes(self, input_shape: Sequence[int]) -> Dict[str, Tuple]:
        """Abstract-eval the graph on an NHWC input of `input_shape`;
        returns {tensor_name: (tag, NCHW-semantics shape)}. Weights stay
        concrete so shape-computation chains still constant-fold."""
        import jax
        import jax.numpy as jnp

        shapes: Dict[str, Tuple] = {}
        x = jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32)
        jax.eval_shape(
            lambda xx: self.apply(self.variables, xx, shape_out=shapes), x)
        return shapes

    # ------------------------------------------------------------ op table

    def _static_np(self, env, name) -> Optional[np.ndarray]:
        """Resolve an input that must be a TRACE-TIME constant (Reshape
        target, Slice indices, Resize scales, reduce axes, ...).

        Under jit the caller's `variables` leaves are tracers, so env lookups
        for initializer-backed inputs are no longer numpy — but these values
        are structural constants of the graph, so read them from the parsed
        initializers (load-time bytes) instead. Graphs whose structural
        constants arrive via Constant nodes (the torch exporter) still
        resolve through env. Returns None when the value is genuinely
        dynamic."""
        if not name:
            return None
        if name in self.graph.initializers:
            return self.graph.initializers[name]
        if name in env:
            v = env[name][1]
            if isinstance(v, (np.ndarray, np.generic)):
                return np.asarray(v)
            # eager mode: a shape chain that crossed an op _fold_numpy
            # doesn't cover yields a CONCRETE jax array — still static
            import jax

            if isinstance(v, jax.Array) and not isinstance(
                    v, jax.core.Tracer):
                return np.asarray(v)
        return None

    def _static_req(self, env, name, node) -> np.ndarray:
        v = self._static_np(env, name)
        if v is None:
            raise UnsupportedOp(
                f"{node.op_type} (node {node.name}): input {name!r} must be "
                "a static shape/index tensor but is data-dependent")
        return v

    def _get(self, env, name, jnp, layout="raw"):
        """Fetch an input in the requested layout; weights/constants pass
        through as numpy (fold-friendly)."""
        if name == "":
            return None
        tag, val = env[name]
        if tag == "w":
            return val
        if isinstance(val, np.ndarray):
            return val
        if layout == "nhwc":
            return _to_nhwc(tag, val, jnp)
        return _to_raw(tag, val, jnp)

    def _tagof(self, env, name):
        return env[name][0]

    def _exec(self, node: OnnxNode, env, jnp):
        import jax
        from jax import lax

        op = node.op_type
        ins = node.inputs
        attrs = node.attrs
        out = node.outputs[0]

        # ---- constant folding: all inputs are static numpy -> run in
        # numpy (np.generic covers 0-d results like np.take with scalar
        # index, which would otherwise poison a shape chain into tracers)
        if op not in ("Conv",) and ins and all(
                i == "" or isinstance(env[i][1], (np.ndarray, np.generic))
                for i in ins):
            folded = self._fold_numpy(node, env)
            if folded is not None:
                for o, v in zip(node.outputs, folded):
                    env[o] = ("raw", np.asarray(v))
                return

        if op == "Conv":
            xv = self._get(env, ins[0], jnp, "nhwc").astype(self.dtype)
            k = self._get(env, ins[1], jnp)                  # HWIO
            groups = int(attrs.get("group", 1))
            strides = _pair(attrs.get("strides"))
            dil = _pair(attrs.get("dilations"))
            padding = _resolve_pads(attrs, xv.shape[1:3],
                                    (k.shape[0], k.shape[1]), strides, dil)
            y = lax.conv_general_dilated(
                xv, jnp.asarray(k, self.dtype), window_strides=strides,
                padding=padding, rhs_dilation=dil,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
                precision=self.precision)
            if len(ins) > 2 and ins[2]:
                y = y + jnp.asarray(self._get(env, ins[2], jnp),
                                    self.dtype).reshape(1, 1, 1, -1)
            env[out] = ("nhwc", y)
        elif op == "BatchNormalization":
            tag, xval = env[ins[0]]
            eps = float(attrs.get("epsilon", 1e-5))
            scale, bias, mean, var = (
                jnp.asarray(self._get(env, ins[j], jnp), jnp.float32)
                for j in (1, 2, 3, 4))
            inv = (scale / jnp.sqrt(var + eps)).astype(self.dtype)
            add = (bias - mean * (scale / jnp.sqrt(var + eps))).astype(
                self.dtype)
            if tag == "nhwc":
                env[out] = ("nhwc", xval * inv + add)
            else:
                shape = (1, -1) + (1,) * (xval.ndim - 2)
                env[out] = ("raw", xval * inv.reshape(shape)
                            + add.reshape(shape))
        elif op == "InstanceNormalization":
            # Used by GroupNorm exports: Reshape -> IN -> Reshape.
            xv = self._get(env, ins[0], jnp)                 # raw (N, C, ...)
            eps = float(attrs.get("epsilon", 1e-5))
            scale = self._get(env, ins[1], jnp)
            bias = self._get(env, ins[2], jnp)
            axes = tuple(range(2, xv.ndim))
            mean = jnp.mean(xv, axis=axes, keepdims=True)
            var = jnp.mean(jnp.square(xv - mean), axis=axes, keepdims=True)
            shape = (1, -1) + (1,) * (xv.ndim - 2)
            y = (xv - mean) * lax.rsqrt(var + eps)
            y = y * jnp.asarray(scale, self.dtype).reshape(shape) \
                + jnp.asarray(bias, self.dtype).reshape(shape)
            env[out] = ("raw", y)
        elif op == "PRelu":
            tag, xval = env[ins[0]]
            slope = jnp.asarray(self._get(env, ins[1], jnp),
                                self.dtype).reshape(-1)
            if tag == "nhwc":
                s = slope.reshape(1, 1, 1, -1)
                env[out] = ("nhwc", jnp.where(xval >= 0, xval, s * xval))
            else:
                shape = ((1, -1) + (1,) * (xval.ndim - 2)) if xval.ndim > 1 \
                    else (-1,)
                env[out] = ("raw", jnp.where(
                    xval >= 0, xval, slope.reshape(shape) * xval))
        elif op in ("Relu", "LeakyRelu", "Sigmoid", "Exp", "Tanh", "Sqrt",
                    "Neg", "Abs", "Softplus", "Erf", "HardSigmoid",
                    "HardSwish", "Identity", "Dropout"):
            tag, xval = env[ins[0]]
            fn = {
                "Relu": lambda v: jnp.maximum(v, 0),
                "LeakyRelu": lambda v: jnp.where(
                    v >= 0, v, float(attrs.get("alpha", 0.01)) * v),
                "Sigmoid": jax.nn.sigmoid,
                "Exp": jnp.exp, "Tanh": jnp.tanh, "Sqrt": jnp.sqrt,
                "Neg": lambda v: -v, "Abs": jnp.abs,
                "Softplus": jax.nn.softplus, "Erf": lax.erf,
                "HardSigmoid": lambda v: jnp.clip(
                    float(attrs.get("alpha", 0.2)) * v
                    + float(attrs.get("beta", 0.5)), 0, 1),
                "HardSwish": lambda v: v * jnp.clip(v / 6 + 0.5, 0, 1),
                "Identity": lambda v: v, "Dropout": lambda v: v,
            }[op]
            env[out] = (tag, fn(xval))
        elif op in ("Add", "Sub", "Mul", "Div", "Pow", "Min", "Max"):
            ta, a = env[ins[0]]
            tb, b = env[ins[1]]
            fn = {"Add": jnp.add, "Sub": jnp.subtract, "Mul": jnp.multiply,
                  "Div": jnp.divide, "Pow": jnp.power,
                  "Min": jnp.minimum, "Max": jnp.maximum}[op]
            if ta == tb and ta in ("nhwc", "raw"):
                env[out] = (ta, fn(a, b))
            elif "nhwc" in (ta, tb):
                # mixed: broadcast the raw side into NHWC when it is a
                # per-channel (C,1,1)/(1,C,1,1) factor, else drop to raw.
                nh, (traw, raw) = (a, (tb, b)) if ta == "nhwc" else (b, (ta, a))
                rs = np.asarray(raw).shape if isinstance(raw, np.ndarray) \
                    else raw.shape
                c = nh.shape[-1]
                scalar = all(d == 1 for d in rs) or rs == ()
                # per-channel ONLY when the non-unit dim is the NCHW channel
                # axis — an H/W-axis factor whose size happens to equal C
                # must NOT be rebroadcast along channels
                chan = ((len(rs) == 1 and rs[0] == c)
                        or (len(rs) >= 2 and rs[1] == c
                            and all(d == 1 for i, d in enumerate(rs)
                                    if i != 1)))
                if scalar or chan:
                    vec = jnp.asarray(raw, self.dtype).reshape(-1)
                    vec = (vec.reshape(()) if scalar
                           else vec.reshape(1, 1, 1, -1))
                    args = (nh, vec) if ta == "nhwc" else (vec, nh)
                    env[out] = ("nhwc", fn(*args))
                else:
                    # general fallback: convert both to NCHW semantics —
                    # always correct, just not layout-optimized
                    ra = self._get(env, ins[0], jnp)
                    rb = self._get(env, ins[1], jnp)
                    env[out] = ("raw", fn(ra, rb))
            else:
                env[out] = ("raw", fn(self._get(env, ins[0], jnp),
                                      self._get(env, ins[1], jnp)))
        elif op == "Concat":
            axis = int(attrs.get("axis", 0))
            tags = [self._tagof(env, i) for i in ins]
            if all(t == "nhwc" for t in tags) and axis == 1:
                env[out] = ("nhwc", jnp.concatenate(
                    [env[i][1] for i in ins], axis=3))
            else:
                vals = [self._get(env, i, jnp) for i in ins]
                env[out] = ("raw", jnp.concatenate(vals, axis=axis))
        elif op in ("Reshape", "Flatten", "Squeeze", "Unsqueeze",
                    "Transpose", "Slice", "Gather", "Split", "Expand",
                    "Softmax", "ReduceMean", "ReduceSum", "ArgMax", "Cast",
                    "Shape", "ConstantOfShape", "Range", "Where", "Equal",
                    "Greater", "Less", "Clip", "MatMul", "Gemm", "Resize",
                    "Upsample", "MaxPool", "AveragePool",
                    "GlobalAveragePool"):
            self._exec_raw(node, env, jnp)
        elif op == "Constant":
            val = attrs.get("value")
            env[out] = ("raw", np.asarray(val))
        else:
            raise UnsupportedOp(f"{op} (node {node.name})")

    def _exec_raw(self, node, env, jnp):
        """Ops executed in ONNX-native (raw/NCHW) layout."""
        import jax
        from jax import lax

        op = node.op_type
        ins = node.inputs
        attrs = node.attrs
        out = node.outputs[0]

        if op in ("MaxPool", "AveragePool", "GlobalAveragePool", "Resize",
                  "Upsample"):
            # window ops stay in NHWC (TPU layout)
            xv = self._get(env, ins[0], jnp, "nhwc")
            if op == "GlobalAveragePool":
                y = jnp.mean(xv, axis=(1, 2), keepdims=True)
                env[out] = ("nhwc", y)
                return
            if op in ("Resize", "Upsample"):
                # nearest 2x (the FPN top-down path); general scales via
                # repeat when integer. Inputs are POSITIONAL per the spec:
                # Upsample(X, scales); Resize(X, roi, scales, sizes) — a
                # 'sizes' input (absolute dims, opset 11+) must not be
                # misread as scale factors.
                def _static(name):
                    return self._static_np(env, name)

                scales = None
                if op == "Upsample":
                    arr = _static(ins[1]) if len(ins) > 1 else None
                    if arr is not None and arr.size == 4:
                        scales = arr.astype(np.float64)
                else:
                    arr = _static(ins[2]) if len(ins) > 2 else None
                    if arr is not None and arr.size == 4:
                        scales = arr.astype(np.float64)
                    elif len(ins) > 3:
                        sizes = _static(ins[3])
                        if sizes is not None and sizes.size == 4:
                            # NCHW sizes -> per-axis scale vs current shape
                            cur_h, cur_w = xv.shape[1], xv.shape[2]
                            scales = np.asarray(
                                [1.0, 1.0, float(sizes[2]) / cur_h,
                                 float(sizes[3]) / cur_w])
                if scales is None and "scales" in attrs:
                    scales = np.asarray(attrs["scales"], np.float64)
                if scales is None or scales.size != 4:
                    raise UnsupportedOp("Resize without static scales")
                sh, sw = int(round(scales[2])), int(round(scales[3]))
                mode = attrs.get("mode", "nearest")
                if isinstance(mode, bytes):
                    mode = mode.decode()
                if (mode not in ("nearest",) or sh < 1 or sw < 1
                        or abs(scales[2] - sh) > 1e-6
                        or abs(scales[3] - sw) > 1e-6):
                    raise UnsupportedOp(f"Resize mode={mode} scales={scales}")
                y = jnp.repeat(jnp.repeat(xv, sh, axis=1), sw, axis=2)
                env[out] = ("nhwc", y)
                return
            kernel = _pair(attrs.get("kernel_shape"))
            strides = _pair(attrs.get("strides"))
            hw_pads = _resolve_pads(attrs, xv.shape[1:3], kernel, strides,
                                    (1, 1))
            if int(attrs.get("ceil_mode", 0)):
                # legal only when ceil == floor for these shapes; computing
                # the floor shape otherwise would silently break parity
                for size, k, s, (p0, p1) in zip(xv.shape[1:3], kernel,
                                                strides, hw_pads):
                    if (int(size) + p0 + p1 - k) % s:
                        raise UnsupportedOp(
                            f"{op} ceil_mode=1 changes the output size "
                            f"(in={size}, k={k}, s={s}, pads=({p0},{p1}))")
            padding = ((0, 0), hw_pads[0], hw_pads[1], (0, 0))
            if op == "MaxPool":
                y = lax.reduce_window(
                    xv, -jnp.inf, lax.max, (1, *kernel, 1), (1, *strides, 1),
                    padding)
            else:
                cip = int(attrs.get("count_include_pad", 0))
                ones = jnp.ones_like(xv) if not cip else None
                y = lax.reduce_window(
                    xv, 0.0, lax.add, (1, *kernel, 1), (1, *strides, 1),
                    padding)
                if cip:
                    y = y / float(kernel[0] * kernel[1])
                else:
                    cnt = lax.reduce_window(
                        ones, 0.0, lax.add, (1, *kernel, 1),
                        (1, *strides, 1), padding)
                    y = y / cnt
            env[out] = ("nhwc", y)
            return

        xv = self._get(env, ins[0], jnp) if ins else None

        if op == "Shape":
            env[out] = ("raw", np.asarray(xv.shape, np.int64))
        elif op == "Reshape":
            shape = [int(s) for s in
                     self._static_req(env, ins[1], node).reshape(-1)
                     .tolist()]
            # ONNX: 0 copies the corresponding input dim (allowzero=0)
            shape = [xv.shape[i] if s == 0 and i < xv.ndim else s
                     for i, s in enumerate(shape)]
            env[out] = ("raw", jnp.reshape(xv, shape))
        elif op == "Flatten":
            axis = int(attrs.get("axis", 1))
            lead = int(np.prod(xv.shape[:axis])) if axis else 1
            env[out] = ("raw", jnp.reshape(xv, (lead, -1)))
        elif op == "Squeeze":
            axes = attrs.get("axes")
            if axes is None and len(ins) > 1 and ins[1]:
                axes = self._static_req(env, ins[1], node).reshape(-1) \
                    .tolist()
            env[out] = ("raw", jnp.squeeze(
                xv, axis=tuple(int(a) for a in axes) if axes else None))
        elif op == "Unsqueeze":
            axes = attrs.get("axes")
            if axes is None and len(ins) > 1 and ins[1]:
                axes = self._static_req(env, ins[1], node).reshape(-1) \
                    .tolist()
            y = xv
            for a in sorted(int(a) for a in axes):
                y = jnp.expand_dims(y, a)
            env[out] = ("raw", y)
        elif op == "Transpose":
            perm = attrs.get("perm")
            env[out] = ("raw", jnp.transpose(
                xv, tuple(int(p) for p in perm) if perm else None))
        elif op == "Slice":
            if len(ins) > 1:     # opset 10+: starts/ends/axes/steps inputs
                starts = self._static_req(env, ins[1], node).reshape(-1)
                ends = self._static_req(env, ins[2], node).reshape(-1)
                axes = (self._static_req(env, ins[3], node).reshape(-1)
                        if len(ins) > 3 and ins[3] else
                        np.arange(len(starts)))
                steps = (self._static_req(env, ins[4], node).reshape(-1)
                         if len(ins) > 4 and ins[4] else
                         np.ones(len(starts), np.int64))
            else:
                starts = np.asarray(attrs["starts"])
                ends = np.asarray(attrs["ends"])
                axes = np.asarray(attrs.get("axes", range(len(starts))))
                steps = np.ones(len(starts), np.int64)
            sl = [slice(None)] * xv.ndim
            for st, en, ax, sp in zip(starts, ends, axes, steps):
                sl[int(ax)] = slice(int(st) if st > -2**31 else None,
                                    int(en) if abs(en) < 2**31 else None,
                                    int(sp))
            env[out] = ("raw", xv[tuple(sl)])
        elif op == "Gather":
            idx = self._get(env, ins[1], jnp)
            axis = int(attrs.get("axis", 0))
            env[out] = ("raw", jnp.take(xv, jnp.asarray(idx), axis=axis))
        elif op == "Split":
            axis = int(attrs.get("axis", 0))
            splits = attrs.get("split")
            if splits is None and len(ins) > 1 and ins[1]:
                splits = self._static_req(env, ins[1], node).reshape(-1) \
                    .tolist()
            if splits is None:
                n = len(node.outputs)
                parts = jnp.split(xv, n, axis=axis)
            else:
                idxs = np.cumsum(splits)[:-1].tolist()
                parts = jnp.split(xv, idxs, axis=axis)
            for o, p in zip(node.outputs, parts):
                env[o] = ("raw", p)
        elif op == "Expand":
            shape = [int(s)
                     for s in self._static_req(env, ins[1], node).reshape(-1)]
            env[out] = ("raw", jnp.broadcast_to(
                xv, np.broadcast_shapes(tuple(xv.shape), tuple(shape))))
        elif op == "Softmax":
            axis = int(attrs.get("axis", -1))
            env[out] = ("raw", jax.nn.softmax(xv, axis=axis))
        elif op in ("ReduceMean", "ReduceSum"):
            axes = attrs.get("axes")
            if axes is None and len(ins) > 1 and ins[1]:
                axes = self._static_req(env, ins[1], node).reshape(-1) \
                    .tolist()
            keep = bool(attrs.get("keepdims", 1))
            fn = jnp.mean if op == "ReduceMean" else jnp.sum
            env[out] = ("raw", fn(
                xv, axis=tuple(int(a) for a in axes) if axes else None,
                keepdims=keep))
        elif op == "Cast":
            to = int(attrs.get("to", 1))
            from .onnx_proto import TENSOR_DTYPES
            env[out] = ("raw", xv.astype(TENSOR_DTYPES.get(to, np.float32)))
        elif op == "Clip":
            lo = self._get(env, ins[1], jnp) if len(ins) > 1 and ins[1] \
                else attrs.get("min")
            hi = self._get(env, ins[2], jnp) if len(ins) > 2 and ins[2] \
                else attrs.get("max")
            y = xv
            if lo is not None:
                y = jnp.maximum(y, jnp.asarray(lo))
            if hi is not None:
                y = jnp.minimum(y, jnp.asarray(hi))
            env[out] = ("raw", y)
        elif op in ("MatMul", "Gemm"):
            a = xv.astype(self.dtype)
            b = jnp.asarray(self._get(env, ins[1], jnp), self.dtype)
            if op == "Gemm":
                if int(attrs.get("transA", 0)):
                    a = a.T
                if int(attrs.get("transB", 0)):
                    b = b.T
                alpha = float(attrs.get("alpha", 1.0))
                y = alpha * jnp.matmul(a, b, precision=self.precision)
                if len(ins) > 2 and ins[2]:
                    beta = float(attrs.get("beta", 1.0))
                    y = y + beta * jnp.asarray(
                        self._get(env, ins[2], jnp), self.dtype)
            else:
                y = jnp.matmul(a, b, precision=self.precision)
            env[out] = ("raw", y)
        elif op in ("Where", "Equal", "Greater", "Less"):
            vals = [self._get(env, i, jnp) for i in ins]
            fn = {"Where": jnp.where, "Equal": jnp.equal,
                  "Greater": jnp.greater, "Less": jnp.less}[op]
            env[out] = ("raw", fn(*vals))
        elif op == "ConstantOfShape":
            shape = [int(s)
                     for s in self._static_req(env, ins[0], node).reshape(-1)]
            val = attrs.get("value", np.zeros(1, np.float32))
            env[out] = ("raw", np.full(shape, np.asarray(val).reshape(-1)[0]))
        elif op == "Range":
            s, e, d = (self._static_req(env, i, node).reshape(())
                       for i in ins)
            env[out] = ("raw", np.arange(s, e, d))
        else:  # pragma: no cover
            raise UnsupportedOp(op)

    def _fold_numpy(self, node, env) -> Optional[List[np.ndarray]]:
        """Execute a node whose inputs are all static, in numpy."""
        op = node.op_type
        ins = [env[i][1] if i else None for i in node.inputs]
        attrs = node.attrs
        try:
            if op == "Shape":
                return [np.asarray(ins[0].shape, np.int64)]
            if op == "Gather":
                return [np.take(ins[0], ins[1].astype(np.int64),
                                axis=int(attrs.get("axis", 0)))]
            if op == "Unsqueeze":
                axes = attrs.get("axes")
                if axes is None and len(ins) > 1:
                    axes = ins[1].reshape(-1).tolist()
                y = ins[0]
                for a in sorted(int(a) for a in axes):
                    y = np.expand_dims(y, a)
                return [y]
            if op == "Squeeze":
                axes = attrs.get("axes")
                if axes is None and len(ins) > 1 and ins[1] is not None:
                    axes = ins[1].reshape(-1).tolist()
                return [np.squeeze(ins[0], axis=tuple(int(a) for a in axes)
                                   if axes else None)]
            if op == "Concat":
                return [np.concatenate([i for i in ins if i is not None],
                                       axis=int(attrs.get("axis", 0)))]
            if op == "Cast":
                from .onnx_proto import TENSOR_DTYPES
                return [ins[0].astype(
                    TENSOR_DTYPES.get(int(attrs.get("to", 1)), np.float32))]
            if op == "Constant":
                return [np.asarray(attrs.get("value"))]
            if op in ("Add", "Sub", "Mul", "Div"):
                fn = {"Add": np.add, "Sub": np.subtract,
                      "Mul": np.multiply, "Div": np.divide}[op]
                return [fn(ins[0], ins[1])]
            if op == "Reshape":
                return [ins[0].reshape([int(s) for s in ins[1].reshape(-1)])]
            if op == "Slice" and len(ins) > 1:
                starts = ins[1].reshape(-1)
                ends = ins[2].reshape(-1)
                axes = (ins[3].reshape(-1) if len(ins) > 3
                        and ins[3] is not None else np.arange(len(starts)))
                steps = (ins[4].reshape(-1) if len(ins) > 4
                         and ins[4] is not None
                         else np.ones(len(starts), np.int64))
                sl = [slice(None)] * ins[0].ndim
                for st, en, ax, sp in zip(starts, ends, axes, steps):
                    sl[int(ax)] = slice(
                        int(st) if st > -2**31 else None,
                        int(en) if abs(en) < 2**31 else None, int(sp))
                return [ins[0][tuple(sl)]]
            if op == "Range":
                return [np.arange(ins[0].reshape(()), ins[1].reshape(()),
                                  ins[2].reshape(()))]
            if op == "ConstantOfShape":
                val = attrs.get("value", np.zeros(1, np.float32))
                return [np.full([int(s) for s in ins[0].reshape(-1)],
                                np.asarray(val).reshape(-1)[0])]
        except Exception:
            return None
        return None


def onnx_model(path: str, dtype: Any = None) -> OnnxModel:
    return OnnxModel(load_onnx(path), dtype=dtype)
