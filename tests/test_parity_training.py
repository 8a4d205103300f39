"""Training-recipe parity: torch model and JAX model trained from the same
init on the same batches track each other (perseus_tpu/eval/parity.py, the
constructive form of BASELINE.md target 3)."""

import numpy as np

from perseus_tpu.data.synthetic import generate_synthetic_pruned_dataset
from perseus_tpu.eval.parity import ParityConfig, run_parity


def test_parity_training_tracks(tmp_path):
    path = generate_synthetic_pruned_dataset(str(tmp_path), n_train=24, n_test=8, h=32, w=32)
    result = run_parity(ParityConfig(dataset_path=path, batch_size=8, epochs=2))
    # same init, same batches, same recipe -> matched training trajectory
    assert 0.8 < result["rmse_ratio"] < 1.25, result
    t_loss, j_loss = result["final_losses"]
    assert abs(t_loss - j_loss) < 0.2 * max(t_loss, 1e-6), result
    # exported JAX weights reproduce identical logits in the torch model
    assert result["roundtrip_logits_max_abs_diff"] < 1e-5, result


def test_parity_training_with_augmentation(tmp_path):
    """Recipe parity WITH the augmentation pipeline in the loop: every batch
    is augmented once (affine+keypoints, erasing, depth ops, transplant) and
    the identical tensors train both models — the ratio stays ~1 through the
    full augmented recipe, not just on clean images."""
    path = generate_synthetic_pruned_dataset(str(tmp_path), n_train=24, n_test=8, h=32, w=32)
    result = run_parity(
        ParityConfig(dataset_path=path, batch_size=8, epochs=2, augmented=True)
    )
    assert result["augmented"] is True
    assert 0.8 < result["rmse_ratio"] < 1.25, result
    t_loss, j_loss = result["final_losses"]
    assert abs(t_loss - j_loss) < 0.2 * max(t_loss, 1e-6), result
