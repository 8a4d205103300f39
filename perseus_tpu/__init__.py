"""perseus_tpu: a TPU-native (JAX/XLA/Pallas) cube keypoint tracking stack.

Re-designed from scratch with the capabilities of the reference perseus stack
(see SURVEY.md): a ResNet-18 keypoint regressor over 256x256 RGB(D) frames,
a fused augmentation pipeline, data-parallel training over a device mesh, a
batched fixed-lag Levenberg-Marquardt pose smoother on SE(3), HDF5 dataset
tooling, and a streaming camera->keypoints->pose runtime compiled into a
single XLA program.

Mirrors the reference's package-root path convention
(reference: perseus/__init__.py:4).
"""

import os

# Absolute path of the repository root (the parent of this package), used to
# resolve all relative dataset/checkpoint paths, like the reference's ROOT.
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

__version__ = "0.1.0"

__all__ = ["ROOT", "__version__"]
