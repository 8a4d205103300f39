"""Torch ResNet-18 oracle — canonical copy lives in
perseus_tpu/eval/torch_oracle.py (also used by the training-parity
experiment, perseus_tpu/eval/parity.py); re-exported here for the
differential tests."""

from perseus_tpu.eval.torch_oracle import BasicBlock, ResNet18, TorchKeypointCNN

__all__ = ["BasicBlock", "ResNet18", "TorchKeypointCNN"]
