"""Model zoo: flax.linen modules for the RDPN dense-pose family."""

from .conv_pnp import ConvPnPNet
from .heads import DenseHead, TransHead
from .pointnet import SpatialPointNet
from .rdpn import RDPN, dummy_batch, init_model
from .resnet import RESNET_SPECS, ResNetTrunk

__all__ = [
    "ConvPnPNet", "DenseHead", "TransHead", "SpatialPointNet", "RDPN",
    "dummy_batch", "init_model", "RESNET_SPECS", "ResNetTrunk",
]
