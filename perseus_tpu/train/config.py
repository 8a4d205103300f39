"""Training configuration, mirroring the reference's TrainConfig surface
(reference: perseus/detector/train.py:34-84) with TPU-appropriate fields
replacing CUDA-specific ones (device/gpu_ids/amp -> mesh + compute dtype)."""

from __future__ import annotations

from dataclasses import dataclass, field

from perseus_tpu.augment.pipeline import AugmentationConfig
from perseus_tpu.data.dataset import KeypointDatasetConfig

__all__ = ["TrainConfig"]


@dataclass(frozen=True)
class TrainConfig:
    """Configuration for training."""

    # The global batch size (sharded over the data-parallel mesh axis).
    batch_size: int = 256

    # The (initial) learning rate set in the optimizer.
    learning_rate: float = 1e-3

    # The number of epochs to train for.
    n_epochs: int = 100

    # Training schedule.
    val_epochs: int = 1
    print_epochs: int = 1
    save_epochs: int = 5

    # Dataset parameters.
    dataset_config: KeypointDatasetConfig = field(default_factory=KeypointDatasetConfig)

    # Data augmentation parameters.
    augmentation_config: AugmentationConfig = field(default_factory=AugmentationConfig)

    # Model parameters.
    n_keypoints: int = 8
    in_channels: int = 4  # 3 for RGB, 4 for RGBD

    # Whether to shard the batch over all local devices (the TPU equivalent
    # of the reference's multigpu DDP switch).
    multigpu: bool = True

    # bf16 matmul/conv compute (the TPU equivalent of the reference's amp).
    amp: bool = True

    # Random seed.
    random_seed: int = 42

    # Wandb-style project for metric logging.
    wandb_project: str = "perseus-detector"

    # Optional checkpoint to initialize from: an orbax run dir or a
    # reference-format .pth (the reference fine-tunes pretrained torchvision
    # weights; models.py:20 — supply them via this converter path).
    init_checkpoint: str = ""

    # Resume a previous run exactly (params, optimizer state, epoch, LR
    # schedule) from its orbax checkpoint dir. The reference has no resume
    # path (SURVEY.md section 5); here restart-from-checkpoint is the
    # failure-recovery story.
    resume: str = ""

    # When set, write a jax.profiler trace of a few steady-state steps to
    # this directory (viewable in TensorBoard / xprof).
    profile_dir: str = ""
    profile_steps: int = 5

    # Cache decoded images in host RAM (skips per-epoch PNG/TIFF decode).
    cache_dataset: bool = False

    # LR plateau schedule (reference: train.py:200).
    plateau_patience: int = 5
    plateau_factor: float = 0.25
    min_learning_rate: float = 1e-6

    # Gradient clipping max-norm (reference: train.py:302).
    grad_clip_norm: float = 1.0

    # AdamW decoupled weight decay. torch.optim.AdamW's default is 1e-2
    # (the reference uses it implicitly, train.py:199); optax's default is
    # 1e-4, so this is passed explicitly to keep the recipes equivalent.
    weight_decay: float = 1e-2
