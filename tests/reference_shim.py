"""Test-only import shim for instantiating the reference PyTorch models.

The reference imports timm/torchvision/skimage/torchsummary, which are not in
this image; the models themselves only need DropPath (identity in eval).
This installs minimal fakes so `/root/reference` modules import, FOR PARITY
TESTING ONLY — no reference code is vendored into the framework.
"""
import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"
_installed = False


def install():
    global _installed
    if _installed:
        return True
    try:
        import torch
        import torch.nn as nn
    except Exception:
        return False
    if not hasattr(np, "float"):
        np.float = float  # removed alias still used by the reference

    def fake(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.p = drop_prob

        def forward(self, x):
            return x  # eval-mode identity

    # the reference hardcodes .cuda() inside its tilers/testers
    # (`utils/model_save_util.py:414` etc.); run them on CPU for oracle tests
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self

    fake("timm")
    fake("timm.data", IMAGENET_DEFAULT_MEAN=(0, 0, 0),
         IMAGENET_DEFAULT_STD=(1, 1, 1))
    fake("timm.models")
    fake("timm.models.helpers", load_pretrained=lambda *a, **k: None)
    fake("timm.models.layers", DropPath=DropPath, to_2tuple=lambda x: (x, x),
         trunc_normal_=lambda *a, **k: None)
    fake("timm.models.registry", register_model=lambda f: f)
    fake("torchsummary", summary=lambda *a, **k: None)
    class Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    fake("torchvision")
    fake("torchvision.datasets", DatasetFolder=object)
    fake("torchvision.transforms", Compose=Compose, ToTensor=object,
         Normalize=object)
    sk = fake("skimage")
    sk.transform = fake("skimage.transform", resize=lambda *a, **k: None)
    sk.util = fake("skimage.util", view_as_blocks=None)
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _installed = True
    return True


def import_reference_tmqi():
    """Import the reference TMQI implementation (scipy float64) for use as a
    test oracle.  Patches the removed scipy.signal.gaussian alias and fakes
    the `contracts` / `skimage.util.view_as_blocks` dependencies."""
    import scipy.signal
    import scipy.signal.windows

    if not hasattr(scipy.signal, "gaussian"):
        scipy.signal.gaussian = scipy.signal.windows.gaussian
    if "contracts" not in sys.modules:
        contracts = types.ModuleType("contracts")
        contracts.contract = lambda *a, **k: (lambda f: f)
        sys.modules["contracts"] = contracts

    def view_as_blocks(arr, block_shape):
        bh, bw = block_shape
        h, w = arr.shape
        return (arr.reshape(h // bh, bh, w // bw, bw).swapaxes(1, 2))

    sk = sys.modules.get("skimage") or types.ModuleType("skimage")
    sku = sys.modules.get("skimage.util") or types.ModuleType("skimage.util")
    sku.view_as_blocks = view_as_blocks
    sk.util = sku
    sys.modules["skimage"] = sk
    sys.modules["skimage.util"] = sku
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import TMQI as ref_tmqi
    return ref_tmqi


def build_reference_unet(video=False, **overrides):
    """Instantiate the reference generator in eval mode (published config)."""
    install()
    kw = dict(n_channels=1, output_dim=1, last_layer="sigmoid", depth=4,
              layer_factor=4, con_operator="square_and_square_root",
              filters=32, bilinear=False, network="unet", dilation=0,
              to_crop=False, unet_norm="none", stretch_g="none",
              activation="relu", doubleConvTranspose=True,
              padding_mode="replicate", convtranspose_kernel=2, up_mode=False)
    kw.update(overrides)
    if video:
        from models.unet_multi_filters import Unet as RefUnet
    else:
        from models.unet_multi_filters import Unet_singleFrame as RefUnet
    net = RefUnet.UNet(**kw)
    net.eval()
    return net


def import_model_save_util():
    """Import the reference's `utils/model_save_util` (tilers, inference
    pipeline) for use as a test oracle."""
    install()
    import matplotlib
    matplotlib.use("Agg")
    from utils import model_save_util
    return model_save_util


def build_reference_discriminator():
    install()
    from models import Discriminator
    net = Discriminator.SimpleDiscriminator(
        input_size=256, input_dim=1, dim=16, norm="none",
        last_activation="none", simpleD_maxpool=False, padding=0)
    net.eval()
    return net
