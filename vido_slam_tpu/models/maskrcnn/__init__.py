from vido_slam_tpu.models.maskrcnn.model import (  # noqa: F401
    MaskRCNNConfig,
    init_maskrcnn_params,
    maskrcnn_inference,
)
