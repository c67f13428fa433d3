"""Import modules from the read-only reference repo for golden-parity tests.

The reference (PyTorch) lives at /root/reference. Some of its imports
(diffusers, xfuser, flash_attn, ...) are not installed here, so we inject
minimal stub modules before loading. This is used ONLY to produce golden
tensors to test our independent JAX implementation against — reference code is
never vendored into svi_tpu.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REF = "/root/reference"


def _mk_module(name):
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def _ensure_stubs():
    if "diffusers" not in sys.modules:
        diffusers = _mk_module("diffusers")

        import torch as _torch

        class ModelMixin(_torch.nn.Module):
            pass

        class ConfigMixin:
            pass

        def register_to_config(fn=None, **kw):
            if fn is None:
                return lambda f: f
            # decorator on __init__: capture the bound arguments as
            # self.config (what the real diffusers decorator does) — the
            # reference fm_solvers read self.config.* extensively
            import functools
            import inspect

            sig = inspect.signature(fn)

            @functools.wraps(fn)
            def wrapper(self, *args, **kwargs):
                try:
                    bound = sig.bind(self, *args, **kwargs)
                    bound.apply_defaults()
                    cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
                    ns = types.SimpleNamespace(**cfg)
                    object.__setattr__(self, "config", ns)

                    def _reg(**kw2):
                        for k2, v2 in kw2.items():
                            setattr(ns, k2, v2)

                    object.__setattr__(self, "register_to_config", _reg)
                except TypeError:
                    pass
                return fn(self, *args, **kwargs)

            return wrapper

        diffusers.ModelMixin = ModelMixin
        cfg_utils = _mk_module("diffusers.configuration_utils")
        cfg_utils.ConfigMixin = ConfigMixin
        cfg_utils.register_to_config = register_to_config
        diffusers.configuration_utils = cfg_utils
        sys.modules["diffusers"] = diffusers
        sys.modules["diffusers.configuration_utils"] = cfg_utils

        sched_utils = _mk_module("diffusers.schedulers.scheduling_utils")

        class SchedulerMixin:
            pass

        class SchedulerOutput:
            def __init__(self, prev_sample=None):
                self.prev_sample = prev_sample

        import enum

        class KarrasDiffusionSchedulers(enum.Enum):
            DDIMScheduler = 1

        sched_utils.SchedulerMixin = SchedulerMixin
        sched_utils.SchedulerOutput = SchedulerOutput
        sched_utils.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
        schedulers_pkg = _mk_module("diffusers.schedulers")
        schedulers_pkg.scheduling_utils = sched_utils
        sys.modules["diffusers.schedulers"] = schedulers_pkg
        sys.modules["diffusers.schedulers.scheduling_utils"] = sched_utils

        dutils = _mk_module("diffusers.utils")
        dutils.deprecate = lambda *a, **k: None
        dutils.is_scipy_available = lambda: False
        dutils_torch = _mk_module("diffusers.utils.torch_utils")

        def randn_tensor(shape, generator=None, device=None, dtype=None):
            import torch as _t

            return _t.randn(shape, generator=generator, dtype=dtype)

        dutils_torch.randn_tensor = randn_tensor
        dutils.torch_utils = dutils_torch
        diffusers.utils = dutils
        sys.modules["diffusers.utils"] = dutils
        sys.modules["diffusers.utils.torch_utils"] = dutils_torch

    if "modelscope" not in sys.modules:
        ms = _mk_module("modelscope")

        def snapshot_download(*a, **k):
            raise FileNotFoundError(
                "modelscope stub: no network egress in this environment")

        ms.snapshot_download = snapshot_download
        sys.modules["modelscope"] = ms

    if "xfuser" not in sys.modules:
        xfuser = _mk_module("xfuser")
        core = _mk_module("xfuser.core")
        dist = _mk_module("xfuser.core.distributed")
        dist.get_sequence_parallel_rank = lambda: 0
        dist.get_sequence_parallel_world_size = lambda: 1
        dist.get_sp_group = lambda: None
        xfuser.core = core
        core.distributed = dist
        sys.modules["xfuser"] = xfuser
        sys.modules["xfuser.core"] = core
        sys.modules["xfuser.core.distributed"] = dist

    if "pyloudnorm" not in sys.modules:
        # utils/audio_process.py (imported by svi_video_talk) needs these at
        # module scope; pipeline golden tests monkeypatch get_audio_embedding
        # so the functions themselves are never reached
        pyln = _mk_module("pyloudnorm")

        class _Meter:
            def __init__(self, sr):
                raise NotImplementedError("pyloudnorm stub")

        pyln.Meter = _Meter
        pyln.normalize = _mk_module("pyloudnorm.normalize")
        pyln.normalize.loudness = lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("pyloudnorm stub"))
        sys.modules["pyloudnorm"] = pyln

    if "librosa" not in sys.modules:
        lr = _mk_module("librosa")

        def _unavailable(*a, **k):
            raise NotImplementedError("librosa stub (no audio IO in tests)")

        lr.load = _unavailable
        lr.resample = _unavailable
        sys.modules["librosa"] = lr

    if "torchvision" not in sys.modules or not hasattr(
        sys.modules["torchvision"], "transforms"
    ):
        tv = _mk_module("torchvision")
        tvt = _mk_module("torchvision.transforms")

        class _T:
            def __init__(self, *a, **k):
                self.args, self.kwargs = a, k

            def __call__(self, x):
                raise NotImplementedError("torchvision stub")

        class _Normalize:
            def __init__(self, mean, std):
                import torch as _torch

                self.mean = _torch.tensor(mean).view(-1, 1, 1)
                self.std = _torch.tensor(std).view(-1, 1, 1)

            def __call__(self, x):
                return (x - self.mean.to(x.dtype)) / self.std.to(x.dtype)

        class _Compose:
            def __init__(self, transforms):
                self.transforms = transforms

        class _InterpolationMode:
            BICUBIC = "bicubic"

        class _GaussianBlur:
            """Functional torchvision.transforms.GaussianBlur (the real
            kernel/reflect-pad math) — the reference's merge_latents
            (base.py:67-79) needs a working blur for golden tests."""

            def __init__(self, kernel_size, sigma):
                self.kernel_size = kernel_size if isinstance(
                    kernel_size, (tuple, list)) else (kernel_size, kernel_size)
                self.sigma = sigma if isinstance(sigma, (tuple, list)) \
                    else (sigma, sigma)

            @staticmethod
            def _kernel1d(k, s):
                import torch as _torch

                lim = (k - 1) / 2
                x = _torch.linspace(-lim, lim, k)
                pdf = _torch.exp(-0.5 * (x / s) ** 2)
                return pdf / pdf.sum()

            def __call__(self, img):
                import torch as _torch
                import torch.nn.functional as F

                kx, ky = self.kernel_size
                sx, sy = self.sigma
                c = img.shape[-3]
                k1 = self._kernel1d(ky, sy).to(img.dtype)
                k2 = self._kernel1d(kx, sx).to(img.dtype)
                kernel = _torch.outer(k1, k2)[None, None].expand(c, 1, ky, kx)
                x = img if img.ndim == 4 else img[None]
                x = F.pad(x, (kx // 2, kx // 2, ky // 2, ky // 2),
                          mode="reflect")
                out = F.conv2d(x, kernel, groups=c)
                return out if img.ndim == 4 else out[0]

        tvt.Compose = _Compose
        tvt.Resize = _T
        tvt.CenterCrop = _T
        tvt.ToTensor = _T
        tvt.ToPILImage = _T
        tvt.Normalize = _Normalize
        tvt.InterpolationMode = _InterpolationMode
        tvt.GaussianBlur = _GaussianBlur
        tvt.ColorJitter = _T
        tvt.RandomApply = _T
        tvt.RandomAdjustSharpness = _T
        tvt.RandomResizedCrop = _T  # open_clip/transform.py train-side import
        # torchvision.transforms.functional: to_tensor (used by the VACE
        # image processor) implemented for golden tests; resize delegates to
        # torch antialias interpolate (what real torchvision does for
        # tensors); torchvision.io is an unused import in qwen_vl_utils
        tvf = _mk_module("torchvision.transforms.functional")

        def _to_tensor(pic):
            import numpy as _np
            import torch as _torch

            arr = _np.asarray(pic, _np.float32) / 255.0
            return _torch.from_numpy(arr.transpose(2, 0, 1))

        def _tv_resize(img, size, interpolation="bicubic", antialias=None):
            import torch as _torch

            mode = getattr(interpolation, "value", interpolation)
            x = img[None] if img.ndim == 3 else img
            out = _torch.nn.functional.interpolate(
                x, size=tuple(size), mode=str(mode),
                antialias=bool(antialias))
            return out[0] if img.ndim == 3 else out

        tvf.to_tensor = _to_tensor
        tvf.resize = _tv_resize
        tvt.functional = tvf
        tv.transforms = tvt
        tv.io = _mk_module("torchvision.io")
        tv.__version__ = "0.0.0"
        # torchvision.ops.misc.FrozenBatchNorm2d: imported (unused at eval
        # scale) by the vendored open_clip/utils.py
        tvo = _mk_module("torchvision.ops")
        tvom = _mk_module("torchvision.ops.misc")
        import torch as _torch

        class _FrozenBatchNorm2d(_torch.nn.Module):
            def __init__(self, num_features, eps=1e-5):
                super().__init__()
                self.register_buffer("weight", _torch.ones(num_features))
                self.register_buffer("bias", _torch.zeros(num_features))
                self.register_buffer("running_mean", _torch.zeros(num_features))
                self.register_buffer("running_var", _torch.ones(num_features))
                self.eps = eps

            def forward(self, x):
                scale = self.weight * (self.running_var + self.eps).rsqrt()
                bias = self.bias - self.running_mean * scale
                return x * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)

        tvom.FrozenBatchNorm2d = _FrozenBatchNorm2d
        tvo.misc = tvom
        tv.ops = tvo
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
        sys.modules["torchvision.io"] = tv.io
        sys.modules["torchvision.ops"] = tvo
        sys.modules["torchvision.ops.misc"] = tvom

    if "ftfy" not in sys.modules:
        # open_clip/tokenizer.py (and some prompters) import ftfy only for
        # whitespace/mojibake cleanup of real prompt text
        ftfy = _mk_module("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy

    if "xformers" not in sys.modules:
        xformers = _mk_module("xformers")
        xops = _mk_module("xformers.ops")

        class _FMHA:
            class BlockDiagonalMask:
                @staticmethod
                def from_seqlens(*a, **k):
                    raise NotImplementedError("xformers stub")

        def memory_efficient_attention(q, k, v, attn_bias=None, op=None):
            """Functional stand-in for golden tests: same (B, M, H, K) layout."""
            import torch as _torch

            assert attn_bias is None, "stub supports bias-free attention only"
            q, k, v = (t.transpose(1, 2) for t in (q, k, v))
            out = _torch.nn.functional.scaled_dot_product_attention(q, k, v)
            return out.transpose(1, 2)

        xops.fmha = _FMHA
        xops.memory_efficient_attention = memory_efficient_attention
        xformers.ops = xops
        sys.modules["xformers"] = xformers
        sys.modules["xformers.ops"] = xops


def load_reference_package():
    """Make `diffsynth` importable from /root/reference (cached)."""
    _ensure_stubs()
    if "diffsynth" in sys.modules:
        return sys.modules["diffsynth"]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # diffsynth/__init__.py pulls in the whole zoo; import submodules directly
    # via a namespace package shim instead.
    pkg = types.ModuleType("diffsynth")
    pkg.__path__ = [f"{REF}/diffsynth"]
    sys.modules["diffsynth"] = pkg
    for sub in ["models", "schedulers", "utils", "prompters", "pipelines",
                "configs", "extensions", "extensions/ImageQualityMetric",
                "extensions/ImageQualityMetric/trainer",
                "extensions/ImageQualityMetric/trainer/models"]:
        dotted = sub.replace("/", ".")
        mod = types.ModuleType(f"diffsynth.{dotted}")
        mod.__path__ = [f"{REF}/diffsynth/{sub}"]
        sys.modules[f"diffsynth.{dotted}"] = mod

    # Names the SVI pipeline module imports from package roots whose real
    # implementations drag in the whole zoo (model_manager imports every
    # model family; prompters need ftfy). The pipeline only *references*
    # them unless those features are exercised.
    class _StubModelManager:  # diffsynth/models/__init__ re-export
        def __init__(self, *a, **k):
            raise NotImplementedError("stub ModelManager (reference_loader)")

    sys.modules["diffsynth.models"].ModelManager = _StubModelManager
    # prompter modules do `from ..models.model_manager import ModelManager`;
    # the real model_manager.py imports the whole zoo, so pre-register a stub
    mm_mod = types.ModuleType("diffsynth.models.model_manager")
    mm_mod.ModelManager = _StubModelManager
    sys.modules["diffsynth.models.model_manager"] = mm_mod

    class _StubWanPrompter:
        def __init__(self, tokenizer_path=None):
            self.tokenizer_path = tokenizer_path

        def fetch_models(self, *a, **k):
            pass

    sys.modules["diffsynth.prompters"].WanPrompter = _StubWanPrompter

    class _StubPrompter:
        def __init__(self, *a, **k):
            pass

        def fetch_models(self, *a, **k):
            pass

        def load_prompt_refiners(self, *a, **k):
            pass

    for name in ("HunyuanDiTPrompter", "SDPrompter", "SDXLPrompter",
                 "SD3Prompter", "FluxPrompter", "HunyuanVideoPrompter",
                 "StepVideoPrompter", "CogPrompter", "OmnigenPrompter",
                 "KolorsPrompter"):
        setattr(sys.modules["diffsynth.prompters"], name, _StubPrompter)

    # scheduler re-exports (diffsynth/schedulers/__init__ pulls nothing heavy,
    # but the namespace shim bypasses it; load the real modules directly)
    for fname, cls_names in [("ddim", ["EnhancedDDIMScheduler"]),
                             ("flow_match", ["FlowMatchScheduler"]),
                             ("continuous_ode", ["ContinuousODEScheduler"])]:
        dotted = f"diffsynth.schedulers.{fname}"
        spec = importlib.util.spec_from_file_location(
            dotted, f"{REF}/diffsynth/schedulers/{fname}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[dotted] = mod
        spec.loader.exec_module(mod)
        for cls in cls_names:
            setattr(sys.modules["diffsynth.schedulers"], cls,
                    getattr(mod, cls))

    vm = types.ModuleType("diffsynth.vram_management")

    def _enable_vram_management(*a, **k):
        raise NotImplementedError("stub vram_management (reference_loader)")

    vm.enable_vram_management = _enable_vram_management
    vm.AutoWrappedModule = object
    vm.AutoWrappedLinear = object
    sys.modules["diffsynth.vram_management"] = vm
    return pkg


def load_ref_module(dotted: str):
    """Import e.g. 'diffsynth.schedulers.flow_match' from the reference tree."""
    load_reference_package()
    parts = dotted.split(".")
    path = REF + "/" + "/".join(parts) + ".py"
    if dotted in sys.modules and not isinstance(sys.modules[dotted], types.ModuleType):
        del sys.modules[dotted]
    if dotted in sys.modules and getattr(sys.modules[dotted], "__file__", None):
        return sys.modules[dotted]
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


class fast_init:
    """Context manager: skip torch's default parameter initialization.

    Constructing billion-parameter reference modules (SDXLUNet & co.) spends
    minutes in kaiming/xavier/normal init on this 1-CPU box, only for tests
    to immediately overwrite every tensor via load_state_dict(randn_like).
    Inside this context the torch.nn.init samplers become no-ops (shapes and
    dtypes untouched), making construction allocation-bound.
    """

    _NAMES = ("uniform_", "normal_", "trunc_normal_", "kaiming_uniform_",
              "kaiming_normal_", "xavier_uniform_", "xavier_normal_",
              "orthogonal_")

    def __enter__(self):
        import torch

        self._saved = {n: getattr(torch.nn.init, n) for n in self._NAMES}
        for n in self._NAMES:
            setattr(torch.nn.init, n, lambda tensor, *a, **k: tensor)
        return self

    def __exit__(self, *exc):
        import torch

        for n, fn in self._saved.items():
            setattr(torch.nn.init, n, fn)
        return False
