"""Base experiment config (counterpart of configs/_base_/gdrn_base.py +
common_base.py): the flagship RDPN shape — ResNet-34, 256->64, 32 regions,
allo_rot6d + centroid/z, Ranger + flat_and_anneal."""

from rdpn6d_tpu.config import Config


def get_config() -> Config:
    return Config()
