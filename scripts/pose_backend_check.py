"""CPU-vs-TPU pose-eval backend bisect (VERDICT round-4 item 3).

Round 4 left open a 3x rotation-RMSE divergence between backends for the
same checkpoint/job/code. This harness isolates WHERE the paths diverge by
dumping every intermediate of evaluate_pose_tracking on the current
backend:

  * per-frame detector keypoints (the ResNet forward),
  * per-frame smoothed poses (the LM smoother downstream of detections),
  * the final metrics,

plus a second smoother pass fed FIXED keypoints (loaded from a reference
dump), which separates "detector forward differs across backends" from
"smoother LM differs across backends".

Usage (two subprocesses, then compare):
    python scripts/pose_backend_check.py --platform cpu    --out /tmp/pose_cpu.npz
    python scripts/pose_backend_check.py --platform default --out /tmp/pose_tpu.npz \
        --fixed-keypoints /tmp/pose_cpu.npz
    python scripts/pose_backend_check.py --compare /tmp/pose_cpu.npz,/tmp/pose_tpu.npz
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


@dataclasses.dataclass(frozen=True)
class CheckConfig:
    job_dir: str = "outputs/scale_run4/pose_jobs/00000000"
    model_path: str = "outputs/models/lu4qs7vx"
    window: int = 12
    platform: str = "cpu"  # cpu | default (= the TPU when attached)
    amp: bool = True
    out: str = "/tmp/pose_backend.npz"
    # a prior dump whose keypoints are replayed through THIS backend's
    # smoother (bisect: detector fwd vs smoother LM)
    fixed_keypoints: str = ""
    compare: tuple[str, ...] = ()


def run_dump(cfg) -> None:
    import jax.numpy as jnp
    import numpy as np

    from perseus_tpu.eval import pose_eval
    from perseus_tpu.runtime.streaming import StreamingConfig, StreamingPipeline
    from perseus_tpu.smoother.lm import SmootherConfig

    frames, meta = pose_eval.load_job_frames(cfg.job_dir)
    rot_gt, trans_gt, abs_scale = pose_eval._gt_pose_in_camera(meta)
    t = frames.shape[0]
    res = int(meta["flags"]["resolution"])
    scfg = StreamingConfig(
        model_path=cfg.model_path,
        num_channels=4,
        model_h=res,
        model_w=res,
        amp=cfg.amp,
        smooth=True,
        smoother=SmootherConfig(window=cfg.window, dt=1.0 / float(meta["flags"]["frame_rate"])),
        camera_fov=float(meta["camera"]["field_of_view"]),
        depth_in_cube_units=True,
        corner_scale=abs_scale,
    )
    pipeline = StreamingPipeline(scfg)
    kp0, *_ = pipeline(frames[0], pipeline.init_carry())
    carry = pipeline.init_carry(pipeline.smoother.coarse_pose_from_keypoints(kp0))
    kps, rots, trans = [], [], []
    for i in range(t):
        kp, _, carry, pose = pipeline(frames[i], carry)
        kps.append(np.asarray(kp))
        rots.append(np.asarray(pose.rot))
        trans.append(np.asarray(pose.trans))
    kps, rots, trans = np.stack(kps), np.stack(rots), np.stack(trans)

    # smoother-only pass on fixed keypoints (from a prior dump if given,
    # else this run's own detections — makes the smoother input identical
    # across backends)
    fixed_src = cfg.fixed_keypoints or None
    kps_fixed = np.load(fixed_src)["keypoints"] if fixed_src else kps
    stub = pose_eval._stub_detector(scfg, kps_fixed)
    carry2 = stub.init_carry(
        stub.smoother.coarse_pose_from_keypoints(jnp.asarray(kps_fixed[0]))
    )
    rots2, trans2 = [], []
    for i in range(t):
        _, _, carry2, pose2 = stub(np.float32(i), carry2)
        rots2.append(np.asarray(pose2.rot))
        trans2.append(np.asarray(pose2.trans))

    sl = slice(cfg.window, t)
    rel = np.einsum("tji,tjk->tik", rots[sl], rot_gt[sl])
    rerr = np.degrees(pose_eval.rotation_angle(rel))
    terr = np.linalg.norm(trans[sl] - trans_gt[sl], axis=-1)
    unit_to_mm = 0.035 / abs_scale * 1000.0
    metrics = {
        "backend": jax.default_backend(),
        "pose_rmse_deg": float(np.sqrt(np.mean(rerr**2))),
        "pose_rmse_mm": float(np.sqrt(np.mean(terr**2)) * unit_to_mm),
    }
    np.savez(
        cfg.out,
        keypoints=kps,
        rot=rots,
        trans=trans,
        rot_fixedkp=np.stack(rots2),
        trans_fixedkp=np.stack(trans2),
        rot_gt=rot_gt,
        trans_gt=trans_gt,
        metrics=json.dumps(metrics),
        fixed_src=str(fixed_src),
    )
    print(json.dumps(metrics))


def run_compare(a_path: str, b_path: str) -> None:
    import numpy as np

    a, b = np.load(a_path), np.load(b_path)
    ma, mb = json.loads(str(a["metrics"])), json.loads(str(b["metrics"]))
    print(f"A ({ma['backend']}): {ma}")
    print(f"B ({mb['backend']}): {mb}")
    kp_delta = np.abs(a["keypoints"] - b["keypoints"])
    print(f"keypoint delta px: max {kp_delta.max():.4f} mean {kp_delta.mean():.5f}")
    from perseus_tpu.eval.pose_eval import rotation_angle

    rel = np.einsum("tji,tjk->tik", a["rot"], b["rot"])
    print(f"pose rot delta deg (full path): max {np.degrees(rotation_angle(rel)).max():.4f}")
    print(f"pose trans delta units (full path): max {np.abs(a['trans'] - b['trans']).max():.5f}")
    if str(b["fixed_src"]) != "None":
        rel2 = np.einsum("tji,tjk->tik", a["rot_fixedkp"], b["rot_fixedkp"])
        print(f"pose rot delta deg (SAME keypoints): max {np.degrees(rotation_angle(rel2)).max():.4f}")
        print(f"pose trans delta units (SAME keypoints): max "
              f"{np.abs(a['trans_fixedkp'] - b['trans_fixedkp']).max():.5f}")


def main() -> None:
    from perseus_tpu.configs.cli import cli

    cfg = cli(CheckConfig)
    if cfg.compare:
        run_compare(*cfg.compare)
        return
    if cfg.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    run_dump(cfg)


if __name__ == "__main__":
    main()
