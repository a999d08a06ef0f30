from vido_slam_tpu.data.coco import CocoDetectionDataset, DetectionSample
from vido_slam_tpu.data.samplers import (
    grouped_batches,
    iteration_batches,
    shard_epoch,
)
from vido_slam_tpu.data.coco_eval import coco_map

__all__ = [
    "CocoDetectionDataset",
    "DetectionSample",
    "coco_map",
    "grouped_batches",
    "iteration_batches",
    "shard_epoch",
]
