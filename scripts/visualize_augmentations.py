"""CLI for perseus_tpu.eval.visualize.visualize_augmentations (reference: scripts/visualize_augmentations.py)."""

from perseus_tpu.configs.cli import cli
from perseus_tpu.eval.visualize import VisualizeConfig, visualize_augmentations

if __name__ == "__main__":
    print(visualize_augmentations(cli(VisualizeConfig)))
