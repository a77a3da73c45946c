"""Randomized-graph fuzz: ONNX executor vs torch on generated op programs.

The hand-written executor tests (test_onnx_exec.py) cover the op idioms the
five released graphs use, at full scale. This file covers the COMBINATIONS:
a seeded generator composes random small programs from the same op
vocabulary (conv stride/dilation/depthwise, pools, PRelu/LeakyRelu/Clip,
residual adds, concat branches, channel slices, nearest upsample, scalar
muls, GlobalAveragePool->Flatten->Gemm heads), exports each through
torch.onnx, and requires the executor to match torch numerically. Every
seed is fixed — a failure is reproducible and means a real semantics gap
in models/onnx_exec.py, not flake.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from scrfd_arcface_facerecognition_tpu.models.onnx_exec import onnx_model
from torch_export import export_onnx, seeded


class RandomNet(nn.Module):
    """A seeded random program over the executor's supported op set.

    The plan is a list of (kind, payload) steps built with shape tracking,
    so every generated program is valid; forward interprets it.
    """

    def __init__(self, seed: int, in_hw: int = 16, n_ops: int = 12):
        super().__init__()
        rng = np.random.default_rng(seed)
        self.mods = nn.ModuleList()
        self.plan = []
        c, h, w = 3, in_hw, in_hw
        saved_shape = None          # shape of the tensor saved for residual

        def add_mod(m):
            self.mods.append(m)
            return len(self.mods) - 1

        for _ in range(n_ops):
            choices = ["conv", "conv", "act", "bn", "mulconst"]
            if h >= 8:
                choices += ["maxpool", "avgpool"]
            if h <= 16:
                choices.append("up")
            if c <= 24:
                choices.append("branchcat")
            if c >= 4:
                choices.append("slice_c")
            if c % 4 == 0:
                choices.append("gn")    # head-tower idiom (GN as IN+affine)
            if saved_shape == (c, h, w):
                choices += ["resadd", "resadd"]
            kind = rng.choice(choices)

            if kind == "conv":
                k = int(rng.choice([1, 3, 5]))
                s = int(rng.choice([1, 2])) if h >= k else 1
                out = int(rng.integers(4, 20))
                dil = 1
                groups = 1
                if k == 3 and s == 1 and rng.random() < 0.3:
                    dil = 2
                if k == 3 and rng.random() < 0.25:
                    groups, out = c, c          # depthwise
                pad = (k // 2) * dil
                m = nn.Conv2d(c, out, k, s, pad, dilation=dil,
                              groups=groups, bias=bool(rng.random() < 0.7))
                self.plan.append(("mod", add_mod(m)))
                c = out
                h = (h + 2 * pad - dil * (k - 1) - 1) // s + 1
                w = (w + 2 * pad - dil * (k - 1) - 1) // s + 1
            elif kind == "bn":
                self.plan.append(("mod", add_mod(nn.BatchNorm2d(c))))
            elif kind == "gn":
                self.plan.append(("mod", add_mod(nn.GroupNorm(4, c))))
            elif kind == "act":
                act = rng.choice(["relu", "leaky", "sigmoid", "tanh",
                                  "prelu", "clip", "softplus"])
                if act == "prelu":
                    self.plan.append(("mod", add_mod(nn.PReLU(c))))
                else:
                    self.plan.append(("act", str(act)))
            elif kind == "maxpool":
                if rng.random() < 0.5:
                    m = nn.MaxPool2d(2, 2)
                    h, w = h // 2, w // 2
                else:
                    m = nn.MaxPool2d(3, 2, 1)
                    h, w = (h - 1) // 2 + 1, (w - 1) // 2 + 1
                self.plan.append(("mod", add_mod(m)))
            elif kind == "avgpool":
                cip = bool(rng.random() < 0.5)
                m = nn.AvgPool2d(2, 2, count_include_pad=cip)
                self.plan.append(("mod", add_mod(m)))
                h, w = h // 2, w // 2
            elif kind == "up":
                self.plan.append(("up", None))
                h, w = h * 2, w * 2
            elif kind == "branchcat":
                c2 = int(rng.integers(4, 12))
                m = nn.Conv2d(c, c2, 1)
                self.plan.append(("branchcat", add_mod(m)))
                c += c2
            elif kind == "slice_c":
                keep = c // 2
                self.plan.append(("slice_c", keep))
                c = keep
            elif kind == "mulconst":
                self.plan.append(("mulconst", float(rng.uniform(0.5, 1.5))))
            elif kind == "resadd":
                self.plan.append(("resadd", None))
                saved_shape = None

            if saved_shape is None and rng.random() < 0.4:
                self.plan.append(("save", None))
                saved_shape = (c, h, w)

        self.fc = nn.Linear(c, 10)

    def forward(self, x):
        saved = None
        for kind, payload in self.plan:
            if kind == "mod":
                x = self.mods[payload](x)
            elif kind == "act":
                x = {"relu": F.relu,
                     "leaky": lambda v: F.leaky_relu(v, 0.1),
                     "sigmoid": torch.sigmoid, "tanh": torch.tanh,
                     "clip": lambda v: torch.clamp(v, -1.0, 2.0),
                     "softplus": F.softplus}[payload](x)
            elif kind == "up":
                x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            elif kind == "branchcat":
                x = torch.cat([x, self.mods[payload](x)], dim=1)
            elif kind == "slice_c":
                x = x[:, :payload]
            elif kind == "mulconst":
                x = x * payload
            elif kind == "save":
                saved = x
            elif kind == "resadd":
                x = x + saved
                saved = None
        x = F.adaptive_avg_pool2d(x, 1)
        return self.fc(torch.flatten(x, 1))


@pytest.mark.parametrize("seed", range(24))
def test_random_program_matches_torch(tmp_path, seed):
    net = seeded(RandomNet(seed), seed + 100)
    x = torch.randn(2, 3, 16, 16,
                    generator=torch.Generator().manual_seed(seed + 200))
    path = str(tmp_path / f"fuzz_{seed}.onnx")
    export_onnx(net, x, path)
    with torch.no_grad():
        want = net(x).numpy()

    m = onnx_model(path)
    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = np.asarray(jax.jit(m.apply)(m.variables, x_nhwc)[0])
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=2e-3)
