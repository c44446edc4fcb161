"""L2 models: Flax modules for the ProCams nets + the classifier zoo."""

from spaa_tpu.models.warping_net import WarpingNet, affine_from_corners
from spaa_tpu.models.shading_net import ShadingNetSPAA
from spaa_tpu.models.compen_net import CompenNet, CompenNetPlusplus
from spaa_tpu.models.pcnet import PCNet, PCNetCache

__all__ = ["WarpingNet", "affine_from_corners", "ShadingNetSPAA",
           "CompenNet", "CompenNetPlusplus", "PCNet", "PCNetCache"]
