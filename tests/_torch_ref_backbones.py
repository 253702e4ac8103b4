"""Import the reference ED/backbone torch modules for parity tests.

The reference backbones depend on timm / mmcv / mmengine and two compiled
CUDA extensions, none of which are installed.  This module registers faithful
minimal stubs for exactly the symbols the backbone files import, then exposes
`import_ed_backbone(name)`.  The stubs reproduce the *reference behavior* of
each symbol (timm DropPath/Mlp, mmcv build_norm_layer, ...), so a forward
pass through the imported modules is the true reference computation.

Compiled-op notes:
  * DCNv3: InternImage is instantiated with core_op='DCNv3_pytorch' (the
    reference's own pure-torch twin, ops_dcnv3/modules/dcnv3.py:91).
  * MSDeformAttn: MSDeformAttnFunction.apply is monkeypatched to the
    reference's own oracle `ms_deform_attn_core_pytorch`
    (ops/functions/ms_deform_attn_func.py:49-71).
"""

from __future__ import annotations

import importlib
import sys
import types

ED_ROOT = "/root/reference/Pretraining and Finetuning/Encoder_Decoder"

_installed = False


def _timm_stub():
    import collections.abc

    import torch
    from torch import nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
            return tuple(x)
        return (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)

    def drop_path(x, drop_prob: float = 0.0, training: bool = False):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
        return x.div(keep) * rand.floor_()

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            return drop_path(x, self.drop_prob, self.training)

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, drop=0.0):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, out_features)
            self.drop = nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    layers.drop_path = drop_path
    layers.DropPath = DropPath
    layers.Mlp = Mlp
    helpers = types.ModuleType("timm.models.helpers")
    helpers.load_pretrained = lambda *a, **k: None
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn: fn
    models.layers = layers
    models.helpers = helpers
    models.registry = registry
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers
    sys.modules["timm.models.helpers"] = helpers
    sys.modules["timm.models.registry"] = registry


def _mm_stubs():
    from torch import nn
    from torch.nn.modules.batchnorm import _BatchNorm

    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")

    def build_conv_layer(cfg, *args, **kwargs):
        assert cfg is None, f"stub supports default conv only, got {cfg}"
        return nn.Conv2d(*args, **kwargs)

    def build_norm_layer(cfg, num_features, postfix=""):
        cfg = dict(cfg)
        t = cfg.pop("type")
        cfg.pop("requires_grad", None)
        assert t in ("BN", "SyncBN"), f"stub supports BN only, got {t}"
        return f"bn{postfix}", nn.BatchNorm2d(num_features, **cfg)

    def build_plugin_layer(*a, **k):  # pragma: no cover - plugins unused
        raise NotImplementedError

    cnn.build_conv_layer = build_conv_layer
    cnn.build_norm_layer = build_norm_layer
    cnn.build_plugin_layer = build_plugin_layer
    mmcv.cnn = cnn
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.cnn"] = cnn

    mmengine = types.ModuleType("mmengine")
    model = types.ModuleType("mmengine.model")

    class BaseModule(nn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    class Sequential(nn.Sequential):
        def __init__(self, *args, init_cfg=None):
            super().__init__(*args)
            self.init_cfg = init_cfg

    model.BaseModule = BaseModule
    model.Sequential = Sequential
    utils = types.ModuleType("mmengine.utils")
    dl_utils = types.ModuleType("mmengine.utils.dl_utils")
    parrots = types.ModuleType("mmengine.utils.dl_utils.parrots_wrapper")
    parrots._BatchNorm = _BatchNorm
    dist = types.ModuleType("mmengine.dist")
    dist.get_dist_info = lambda: (0, 1)
    mmengine.model = model
    mmengine.utils = utils
    mmengine.dist = dist
    utils.dl_utils = dl_utils
    dl_utils.parrots_wrapper = parrots
    for name, mod in {
        "mmengine": mmengine,
        "mmengine.model": model,
        "mmengine.utils": utils,
        "mmengine.utils.dl_utils": dl_utils,
        "mmengine.utils.dl_utils.parrots_wrapper": parrots,
        "mmengine.dist": dist,
    }.items():
        sys.modules[name] = mod


def _ext_stubs():
    # compiled CUDA extension placeholders: imported at module scope but only
    # *called* on the CUDA path, which parity tests never take
    sys.modules.setdefault("DCNv3", types.ModuleType("DCNv3"))
    sys.modules.setdefault(
        "MultiScaleDeformableAttention", types.ModuleType("MultiScaleDeformableAttention")
    )
    try:
        import pkg_resources

        orig = pkg_resources.get_distribution

        def get_distribution(name):
            if name == "DCNv3":
                return types.SimpleNamespace(version="1.0")
            return orig(name)

        pkg_resources.get_distribution = get_distribution
    except ModuleNotFoundError:  # setuptools >= 80 dropped pkg_resources
        pr = types.ModuleType("pkg_resources")
        pr.get_distribution = lambda name: types.SimpleNamespace(version="1.0")
        sys.modules["pkg_resources"] = pr


def install_backbone_stubs() -> None:
    global _installed
    if _installed:
        return
    _timm_stub()
    _mm_stubs()
    _ext_stubs()
    if ED_ROOT not in sys.path:
        sys.path.insert(0, ED_ROOT)
    _installed = True


def import_ed_backbone(modname: str):
    """Import `backbone.<modname>` from the reference ED tree."""
    install_backbone_stubs()
    return importlib.import_module(f"backbone.{modname}")


def patched_ms_deform_attn():
    """Reference MSDeformAttn module with the CUDA Function routed to the
    reference's pure-torch oracle (CPU-runnable)."""
    install_backbone_stubs()
    func_mod = importlib.import_module("backbone.ops.functions.ms_deform_attn_func")
    mod = importlib.import_module("backbone.ops.modules.ms_deform_attn")

    class _Oracle:
        @staticmethod
        def apply(value, spatial_shapes, level_start_index, sampling_locations,
                  attention_weights, im2col_step):
            return func_mod.ms_deform_attn_core_pytorch(
                value, spatial_shapes, sampling_locations, attention_weights
            )

    mod.MSDeformAttnFunction = _Oracle
    return mod.MSDeformAttn
