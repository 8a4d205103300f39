"""CLI for perseus_tpu.eval.visualize.visualize_data (reference: scripts/visualize_data.py)."""

from perseus_tpu.configs.cli import cli
from perseus_tpu.eval.visualize import VisualizeConfig, visualize_data

if __name__ == "__main__":
    print(visualize_data(cli(VisualizeConfig)))
