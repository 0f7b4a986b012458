"""Model zoo: backbones, subnets, and the assembled MV3D detector."""

from . import backbone, nets  # noqa: F401
from .mv3d_net import MV3DNet, total_loss  # noqa: F401
from .nets import (FRONT_FEATURE, FUSION, IMAGE_FEATURE,  # noqa: F401
                   SUBNET_NAMES, TOP_VIEW_RPN)
