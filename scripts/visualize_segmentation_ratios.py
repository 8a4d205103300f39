"""CLI for perseus_tpu.eval.visualize.visualize_segmentation_ratios (reference: scripts/visualize_segmentation_ratios.py)."""

from perseus_tpu.configs.cli import cli
from perseus_tpu.eval.visualize import VisualizeConfig, visualize_segmentation_ratios

if __name__ == "__main__":
    print(visualize_segmentation_ratios(cli(VisualizeConfig)))
