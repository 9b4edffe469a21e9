"""Import shim for running the reference implementation (/root/reference,
wpeebles/gangealing) on CPU inside our test suite.

The reference JIT-compiles CUDA extensions at import time and imports several
packages absent from this environment (torchvision, sklearn, lmdb, ray,
termcolor, plotly, pandas).  Its CPU code paths never *use* any of them for
the computations we compare against (upfirdn2d/fused_leaky_relu dispatch to
golden CPU fallbacks — reference op/upfirdn2d.py:145-156, op/fused_act.py:87-94)
— so stub modules satisfying the import-time surface are sufficient.

The torchvision stub is the one substantive piece: reference LPIPS backbones
slice `tv.vgg16(...).features` by index (lpips_backbones.py:98-140), so the
stub must reproduce torchvision's exact `features` Sequential layout (layer
indices and shapes); weights are random — parity tests export the reference
state_dict and import it into our models, so both sides share weights.
"""

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _stub_module(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    if "." in name:
        parent, child = name.rsplit(".", 1)
        setattr(sys.modules[parent], child, mod)
    return mod


def _build_torchvision():
    import torch
    import torch.nn as nn

    tv = _stub_module("torchvision")
    tvm = _stub_module("torchvision.models")
    tvt = _stub_module("torchvision.transforms")
    tvu = _stub_module("torchvision.utils")
    tvd = _stub_module("torchvision.datasets")
    tvdu = _stub_module("torchvision.datasets.utils")
    tv.models = tvm
    tv.transforms = tvt
    tv.utils = tvu
    tv.datasets = tvd
    tvd.utils = tvdu

    class _VGG16(nn.Module):
        # torchvision cfg "D": indices must match torchvision exactly.
        def __init__(self):
            super().__init__()
            cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                   512, 512, 512, "M", 512, 512, 512, "M"]
            layers, in_c = [], 3
            for v in cfg:
                if v == "M":
                    layers.append(nn.MaxPool2d(2, 2))
                else:
                    layers.append(nn.Conv2d(in_c, v, 3, padding=1))
                    layers.append(nn.ReLU(inplace=True))
                    in_c = v
            self.features = nn.Sequential(*layers)

    class _AlexNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(True),
                nn.MaxPool2d(3, 2),
                nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(3, 2))

    class _Fire(nn.Module):
        def __init__(self, inp, sq, e1, e3):
            super().__init__()
            self.squeeze = nn.Conv2d(inp, sq, 1)
            self.squeeze_activation = nn.ReLU(True)
            self.expand1x1 = nn.Conv2d(sq, e1, 1)
            self.expand1x1_activation = nn.ReLU(True)
            self.expand3x3 = nn.Conv2d(sq, e3, 3, padding=1)
            self.expand3x3_activation = nn.ReLU(True)

        def forward(self, x):
            x = self.squeeze_activation(self.squeeze(x))
            return torch.cat([
                self.expand1x1_activation(self.expand1x1(x)),
                self.expand3x3_activation(self.expand3x3(x))], 1)

    class _SqueezeNet11(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(True),
                nn.MaxPool2d(3, 2, ceil_mode=True),
                _Fire(64, 16, 64, 64), _Fire(128, 16, 64, 64),
                nn.MaxPool2d(3, 2, ceil_mode=True),
                _Fire(128, 32, 128, 128), _Fire(256, 32, 128, 128),
                nn.MaxPool2d(3, 2, ceil_mode=True),
                _Fire(256, 48, 192, 192), _Fire(384, 48, 192, 192),
                _Fire(384, 64, 256, 256), _Fire(512, 64, 256, 256))

    class _BasicBlock(nn.Module):
        def __init__(self, inp, out, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(out)
            self.relu = nn.ReLU(True)
            self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(out)
            self.downsample = None
            if stride != 1 or inp != out:
                self.downsample = nn.Sequential(
                    nn.Conv2d(inp, out, 1, stride, bias=False),
                    nn.BatchNorm2d(out))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idn)

    class _ResNet(nn.Module):
        def __init__(self, layers):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(True)
            self.maxpool = nn.MaxPool2d(3, 2, padding=1)
            widths = [64, 128, 256, 512]
            inp = 64
            for li, (n, w) in enumerate(zip(layers, widths), start=1):
                blocks = []
                for bi in range(n):
                    stride = 2 if (li > 1 and bi == 0) else 1
                    blocks.append(_BasicBlock(inp, w, stride))
                    inp = w
                setattr(self, f"layer{li}", nn.Sequential(*blocks))

    tvm.vgg16 = lambda pretrained=False, **k: _VGG16()
    tvm.alexnet = lambda pretrained=False, **k: _AlexNet()
    tvm.squeezenet1_1 = lambda pretrained=False, **k: _SqueezeNet11()
    tvm.resnet18 = lambda pretrained=False, **k: _ResNet((2, 2, 2, 2))
    tvm.resnet34 = lambda pretrained=False, **k: _ResNet((3, 4, 6, 3))

    # transforms: the minimal surface datasets/__init__.py touches
    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class _ToTensor:
        def __call__(self, pic):
            import numpy as np
            arr = np.asarray(pic, dtype="float32") / 255.0
            if arr.ndim == 2:
                arr = arr[:, :, None]
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class _Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean, self.std = mean, std

        def __call__(self, t):
            mean = torch.tensor(self.mean).view(-1, 1, 1)
            std = torch.tensor(self.std).view(-1, 1, 1)
            return (t - mean) / std

    tvt.Compose = _Compose
    tvt.ToTensor = _ToTensor
    tvt.Normalize = _Normalize

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: downloads unavailable")

    tvu.make_grid = _unavailable
    tvu.save_image = _unavailable
    tvdu.download_and_extract_archive = _unavailable
    tvdu.download_file_from_google_drive = _unavailable
    tvdu.download_url = _unavailable
    tvdu.extract_archive = _unavailable


def _missing(name):
    """True if the real package is not installed (stub only then — a stub
    must never shadow a real package for the rest of the test session)."""
    import importlib.util
    try:
        return importlib.util.find_spec(name) is None
    except (ImportError, ValueError):
        return name not in sys.modules


def install():
    """Install stubs (for missing packages only) and put /root/reference on
    sys.path. Idempotent."""
    if getattr(install, "_done", False):
        return
    install._done = True

    # cpp_extension.load would JIT-compile CUDA kernels; CPU dispatch never
    # calls into the built module, so an empty namespace suffices.
    import torch
    import torch.utils.cpp_extension as ce
    ce.load = lambda *a, **k: types.SimpleNamespace()

    # The reference hardcodes .cuda() in module constructors
    # (warping_heads.py:158); make it a no-op on CPU-only torch.
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self

    if _missing("torchvision"):
        _build_torchvision()

    if _missing("sklearn"):
        sk = _stub_module("sklearn")
        skd = _stub_module("sklearn.decomposition")
        sk.decomposition = skd

        class _IncrementalPCA:  # import-time only; PCA fitting not exercised
            def __init__(self, *a, **k):
                raise RuntimeError("sklearn stub: PCA fitting unavailable")

        skd.IncrementalPCA = _IncrementalPCA
        skd.PCA = _IncrementalPCA

    if _missing("lmdb"):
        lm = _stub_module("lmdb")
        lm.open = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("lmdb stub"))

    if _missing("ray"):
        ray = _stub_module("ray")

        class _Remote:
            def __init__(self, f):
                self.f = f

            def remote(self, *a, **k):
                return self.f(*a, **k)

        ray.remote = lambda f=None, **k: (_Remote(f) if f is not None
                                          else _Remote)
        ray.init = lambda *a, **k: None
        ray.is_initialized = lambda: True
        ray.get = lambda x: x
        ray.put = lambda x: x

    if _missing("moviepy"):
        mp = _stub_module("moviepy")
        mpe = _stub_module("moviepy.editor")
        mp.editor = mpe
        mpe.ImageSequenceClip = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("moviepy stub"))

    if _missing("termcolor"):
        tc = _stub_module("termcolor")
        tc.colored = lambda text, *a, **k: text

    if _missing("pandas"):
        pd = _stub_module("pandas")
        pd.read_csv = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("pandas stub"))

    if _missing("plotly"):
        pl = _stub_module("plotly")
        go = _stub_module("plotly.graph_objects")
        pc = _stub_module("plotly.colors")
        pl.graph_objects = go
        pl.colors = pc
        go.Figure = object
        go.Scatter = object
        pc.hex_to_rgb = lambda h: tuple(
            int(h.lstrip("#")[i:i + 2], 16) for i in (0, 2, 4))
        pc.find_intermediate_color = lambda a, b, t, colortype=None: a

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def randomize_module(module, scale=0.1, seed=0):
    """Perturb every parameter of a torch module in-place (deterministic).

    Zero-initialized warp heads produce identity warps; parity tests need
    non-trivial warps, so we add noise to all parameters.
    """
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.add_(scale * torch.randn(p.shape, generator=g))
    return module
