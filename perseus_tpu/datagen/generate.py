"""Synthetic video generation: simulate box scenes, render, write job dirs.

Capability equivalent of the reference's datagen drivers (reference:
data_generation/generate_one_video.py, generate_all_videos.py): per video,
randomize a scene — the "mjc" cube with random scale/velocity/angular
velocity, static floor distractors, a few dynamic tossed distractors, a
fixed-random or linearly-moving camera — simulate the trajectories, render
rgba/depth/segmentation layers, and write ``rgba_*.png``, ``depth_*.tiff``,
``segmentation_*.png`` plus a kubric-compatible ``metadata.json`` per job
directory. The output feeds the unchanged downstream pipeline:
datagen/label_dataset.py -> data/merge.py -> data/prune.py -> training.

Differences from the reference, by design (SURVEY.md section 7 step 9):
rendering is the JAX rasterizer in datagen/render.py (Lambert boxes over
noise backgrounds) rather than Blender/Cycles, and the physics is ballistic
rigid-body integration without contacts rather than PyBullet. Out-of-view /
occluded cubes are handled the same way the reference handles them: the
seg-ratio prune (data/prune.py) filters those frames later. Per-video
failures delete the job dir and re-raise, matching generate_one_video.py:376.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu import lie
from perseus_tpu.data import schema
from perseus_tpu.datagen import render

__all__ = ["CUBE_FACE_PALETTE", "VideoConfig", "generate_one_video", "generate_all_videos"]

# Fixed six-face cube albedos in BOX_FACES face order (-x, +x, -y, +y, -z,
# +z): six distinct hues, constant across the dataset so face identity is a
# stable, learnable signal (the mjc.mtl role).
CUBE_FACE_PALETTE = np.array(
    [
        [0.85, 0.15, 0.15],  # -x red
        [0.15, 0.70, 0.20],  # +x green
        [0.15, 0.25, 0.85],  # -y blue
        [0.90, 0.80, 0.15],  # +y yellow
        [0.80, 0.20, 0.75],  # -z magenta
        [0.10, 0.75, 0.75],  # +z cyan
    ],
    dtype=np.float32,
)


@dataclass(frozen=True)
class VideoConfig:
    """Scene randomization ranges (mirrors generate_one_video.py FLAGS)."""

    job_dir: str = "data/job"
    resolution: int = 256
    frames: int = 24
    fps: float = 12.0
    fov: float = 0.8575560548920328  # kubric's 49.1 degree default

    asset_id: str = "mjc"
    cube_scale_range: tuple[float, float] = (0.8, 1.2)
    cube_spawn_region: tuple[float, float] = (-1.0, 1.0)  # xy extent
    cube_spawn_height: tuple[float, float] = (1.5, 3.0)
    max_linear_velocity: float = 1.0
    max_angular_velocity: float = 6.0

    n_static_range: tuple[int, int] = (10, 20)
    n_dynamic_range: tuple[int, int] = (1, 3)
    distractor_scale_range: tuple[float, float] = (0.3, 1.0)

    camera_movement: str = "fixed_random"  # or "linear"
    camera_radius_range: tuple[float, float] = (6.0, 9.0)
    camera_height_range: tuple[float, float] = (2.0, 5.0)
    gravity: float = -2.0  # soft gravity keeps the cube in view for 2 s
    # ground-plane contact for tossed bodies (the PyBullet-dynamics role);
    # False reverts to pure ballistics
    ground_contact: bool = True

    seed: int = 0


def _look_at_blender(position: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Rotation of a Blender camera (-Z forward, +Y up) at `position` looking
    at `target` (matches kubric's camera.look_at)."""
    fwd = target - position
    fwd = fwd / np.linalg.norm(fwd)
    z_cam = -fwd
    world_up = np.array([0.0, 0.0, 1.0])
    x_cam = np.cross(world_up, z_cam)
    n = np.linalg.norm(x_cam)
    if n < 1e-6:  # looking straight up/down
        x_cam = np.array([1.0, 0.0, 0.0])
    else:
        x_cam = x_cam / n
    y_cam = np.cross(z_cam, x_cam)
    return np.stack([x_cam, y_cam, z_cam], axis=-1)


def _support_height(rot: np.ndarray, half_extents: np.ndarray) -> float:
    """Distance from a box's center to its lowest point under rotation
    `rot` (world-from-body): sum_k he_k * |e_z . rot[:, k]|."""
    return float(np.sum(half_extents * np.abs(rot[2, :])))


def _integrate_pose(
    pos0: np.ndarray, rot0: np.ndarray, vel: np.ndarray, ang_vel: np.ndarray,
    frames: int, dt: float, gravity: float,
    half_extents: np.ndarray | None = None,
    restitution: float = 0.35,
    friction: float = 0.25,
) -> tuple[np.ndarray, np.ndarray]:
    """Rigid-body integration: ballistic translation + constant body angular
    velocity, with ground-plane contact when `half_extents` is given.

    The contact model plays the role of the reference's PyBullet simulation
    (generate_one_video.py:248,328 — contact dynamics + settle): when the
    box's support point would penetrate z=0, the position is projected out,
    the vertical velocity reflects with `restitution`, and an impulse
    friction damps the tangential velocity and spin; slow bounces settle.
    A substantial fidelity upgrade over pure ballistics — tossed objects
    land and tumble instead of falling through the floor.
    """
    positions, rotations = [], []
    pos, rot, v, w = pos0.copy(), rot0.copy(), vel.copy(), ang_vel.copy()
    for _ in range(frames):
        positions.append(pos.copy())
        rotations.append(rot.copy())
        pos = pos + v * dt
        v = v + np.array([0.0, 0.0, gravity]) * dt
        rot = rot @ np.asarray(lie.so3_exp(jnp.asarray(w * dt)))
        if half_extents is not None:
            supp = _support_height(rot, half_extents)
            if pos[2] < supp:
                pos[2] = supp
                if v[2] < 0.0:
                    v[2] = -restitution * v[2]
                    if v[2] < 0.15:  # settle slow bounces
                        v[2] = 0.0
                v[:2] *= 1.0 - friction
                w *= 1.0 - friction
    return np.stack(positions), np.stack(rotations)


def _simulate(cfg: VideoConfig, rng: np.random.Generator):
    t, dt = cfg.frames, 1.0 / cfg.fps

    # the cube (instance 0 — the labeler finds it by asset_id)
    abs_scale = float(rng.uniform(*cfg.cube_scale_range))
    lo, hi = cfg.cube_spawn_region
    cube_pos0 = np.array(
        [rng.uniform(lo, hi), rng.uniform(lo, hi), rng.uniform(*cfg.cube_spawn_height)]
    )
    cube_rot0 = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3))))
    cube_vel = rng.uniform(-cfg.max_linear_velocity, cfg.max_linear_velocity, 3)
    cube_ang = rng.uniform(-cfg.max_angular_velocity, cfg.max_angular_velocity, 3)
    cube_pos, cube_rot = _integrate_pose(
        cube_pos0, cube_rot0, cube_vel, cube_ang, t, dt, cfg.gravity,
        half_extents=np.full(3, abs_scale) if cfg.ground_contact else None,
    )

    # distractors: static on the floor + dynamic tossed
    n_static = int(rng.integers(cfg.n_static_range[0], cfg.n_static_range[1] + 1))
    n_dynamic = int(rng.integers(cfg.n_dynamic_range[0], cfg.n_dynamic_range[1] + 1))
    half_extents = [np.full(3, abs_scale)]
    positions, rotations = [cube_pos], [cube_rot]
    for _ in range(n_static):
        he = rng.uniform(*cfg.distractor_scale_range, size=3)
        pos = np.array([rng.uniform(-4, 4), rng.uniform(-4, 4), he[2]])
        rot = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, rng.uniform(0, np.pi)])))
        half_extents.append(he)
        positions.append(np.tile(pos, (t, 1)))
        rotations.append(np.tile(rot, (t, 1, 1)))
    for _ in range(n_dynamic):
        he = rng.uniform(*cfg.distractor_scale_range, size=3)
        pos0 = np.array([rng.uniform(lo, hi), rng.uniform(lo, hi), rng.uniform(1.0, 3.0)])
        rot0 = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3))))
        vel = rng.uniform(-cfg.max_linear_velocity, cfg.max_linear_velocity, 3)
        ang = rng.uniform(-cfg.max_angular_velocity, cfg.max_angular_velocity, 3)
        p, r = _integrate_pose(
            pos0, rot0, vel, ang, t, dt, cfg.gravity,
            half_extents=he if cfg.ground_contact else None,
        )
        half_extents.append(he)
        positions.append(p)
        rotations.append(r)

    # Per-face albedos (O, 6, 3). The cube's six faces get a FIXED distinct
    # palette — the analog of the reference mjc asset's six face textures
    # (data_generation/assets/mjc.mtl), which is what makes corner identity
    # learnable — modulated per video like the reference's randomized
    # Principled-BSDF material (generate_one_video.py:281-295). Distractors
    # get random independent face colors.
    colors = rng.uniform(0.15, 0.95, size=(len(half_extents), 6, 3))
    material_gain = rng.uniform(0.7, 1.1)
    colors[0] = np.clip(CUBE_FACE_PALETTE * material_gain, 0.05, 1.0)

    # camera: on a shell around the scene, looking at the cube spawn region
    target = np.array([0.0, 0.0, 1.0])
    radius = rng.uniform(*cfg.camera_radius_range)
    theta0 = rng.uniform(0, 2 * np.pi)
    h0 = rng.uniform(*cfg.camera_height_range)
    if cfg.camera_movement == "linear":
        theta1 = theta0 + rng.uniform(-0.8, 0.8)
        h1 = rng.uniform(*cfg.camera_height_range)
        thetas = np.linspace(theta0, theta1, t)
        hs = np.linspace(h0, h1, t)
    else:
        thetas = np.full(t, theta0)
        hs = np.full(t, h0)
    cam_pos = np.stack(
        [radius * np.cos(thetas), radius * np.sin(thetas), hs], axis=-1
    )
    cam_rot = np.stack([_look_at_blender(p, target) for p in cam_pos])

    return {
        "half_extents": np.stack(half_extents),
        "positions": np.stack(positions, axis=1),  # (T, O, 3)
        "rotations": np.stack(rotations, axis=1),  # (T, O, 3, 3)
        "colors": colors,
        "abs_scale": abs_scale,
        "cam_pos": cam_pos,
        "cam_rot": cam_rot,
    }


def generate_one_video(cfg: VideoConfig, job_id: str | None = None) -> str:
    """Simulates, renders, and writes one job directory; returns its path."""
    job_id = job_id or uuid.uuid4().hex[:8]
    job_path = os.path.join(cfg.job_dir, job_id)
    os.makedirs(job_path, exist_ok=True)
    try:
        import zlib

        rng = np.random.default_rng([cfg.seed, zlib.crc32(job_id.encode())])
        scene = _simulate(cfg, rng)
        t = cfg.frames

        cam_quat_wxyz = np.stack(
            [np.asarray(lie.rot_to_quat_wxyz(jnp.asarray(r))) for r in scene["cam_rot"]]
        )
        cam_pose7 = jnp.asarray(
            np.concatenate([scene["cam_pos"], cam_quat_wxyz], axis=-1), dtype=jnp.float32
        )

        rgb, depth, seg = render.render_frames(
            jax.random.key(rng.integers(0, 2**31)),
            jnp.asarray(scene["rotations"], dtype=jnp.float32),
            jnp.asarray(scene["positions"], dtype=jnp.float32),
            jnp.asarray(scene["half_extents"], dtype=jnp.float32),
            jnp.asarray(scene["colors"], dtype=jnp.float32),
            jnp.ones((scene["half_extents"].shape[0],), dtype=jnp.float32),
            cam_pose7,
            cfg.fov,
            cfg.resolution,
            cfg.resolution,
        )
        rgb, depth, seg = np.asarray(rgb), np.asarray(depth), np.asarray(seg)

        for i in range(t):
            schema.save_rgb_png(os.path.join(job_path, f"rgba_{i:05d}.png"), rgb[i])
            schema.save_depth_tiff(os.path.join(job_path, f"depth_{i:05d}.tiff"), depth[i])
            schema.save_segmentation_png(
                os.path.join(job_path, f"segmentation_{i:05d}.png"), seg[i].astype(np.uint8)
            )

        instances = []
        for o in range(scene["half_extents"].shape[0]):
            quats = np.stack(
                [
                    np.asarray(lie.rot_to_quat_wxyz(jnp.asarray(scene["rotations"][i, o])))
                    for i in range(t)
                ]
            )
            instances.append(
                {
                    "asset_id": cfg.asset_id if o == 0 else f"distractor_{o}",
                    "abs_scale": float(scene["half_extents"][o, 0]) if o == 0 else float(
                        scene["half_extents"][o].max()
                    ),
                    "positions": scene["positions"][:, o].tolist(),
                    "quaternions": quats.tolist(),
                }
            )
        metadata = {
            "flags": {"resolution": cfg.resolution, "frame_end": t, "frame_rate": cfg.fps},
            "camera": {
                "field_of_view": cfg.fov,
                "positions": scene["cam_pos"].tolist(),
                "quaternions": cam_quat_wxyz.tolist(),
            },
            "instances": instances,
        }
        with open(os.path.join(job_path, "metadata.json"), "w") as f:
            json.dump(metadata, f)
        return job_path
    except Exception:
        shutil.rmtree(job_path, ignore_errors=True)  # like generate_one_video.py:376
        raise


def generate_all_videos(cfg: VideoConfig, n_videos: int = 2500, workers: int = 8) -> list[str]:
    """Generates n_videos job dirs (reference: generate_all_videos.py). Uses a
    process pool for host parallelism; per-video failures are skipped."""
    import multiprocessing as mp

    os.makedirs(cfg.job_dir, exist_ok=True)
    args = [(cfg, f"{i:08x}") for i in range(n_videos)]
    if workers <= 1:
        out = []
        for a in args:
            try:
                out.append(generate_one_video(*a))
            except Exception as exc:
                print(f"video {a[1]} failed: {exc}")
        return out
    with mp.get_context("spawn").Pool(workers) as pool:
        results = pool.starmap(_safe_generate, args)
    return [r for r in results if r]


def _safe_generate(cfg: VideoConfig, job_id: str) -> str | None:
    try:
        return generate_one_video(cfg, job_id)
    except Exception as exc:
        print(f"video {job_id} failed: {exc}")
        return None


def main() -> None:
    from perseus_tpu.configs.cli import cli

    print(generate_one_video(cli(VideoConfig)))


if __name__ == "__main__":
    main()
