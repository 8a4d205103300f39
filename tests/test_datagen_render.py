"""Datagen renderer tests: geometry consistency with the labeler, z-buffer
occlusion, and the generate -> label end-to-end roundtrip."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu import lie
from perseus_tpu.datagen import render
from perseus_tpu.datagen.generate import VideoConfig, generate_one_video
from perseus_tpu.datagen.labeling import cube_corners, label_trajectory

RNG = np.random.default_rng(7)


def _single_cube_scene(h=64, w=64, scale=0.5, cube_z=0.0):
    """One cube at the origin viewed from a Blender camera on +X looking at
    the origin (camera -Z forward = world -X)."""
    t = 2
    rot = jnp.tile(jnp.eye(3), (t, 1, 1))[:, None]  # (T, 1, 3, 3)
    trans = jnp.tile(jnp.asarray([0.0, 0.0, cube_z]), (t, 1))[:, None]
    cam_pos = np.array([4.0, 0.0, 0.0])
    # blender camera at +X looking at origin: z_cam = +X, x_cam = cross(up, z)
    z_cam = np.array([1.0, 0.0, 0.0])
    x_cam = np.array([0.0, -1.0, 0.0])
    y_cam = np.cross(z_cam, x_cam)
    cam_rot = np.stack([x_cam, y_cam, z_cam], axis=-1)
    quat = np.asarray(lie.rot_to_quat_wxyz(jnp.asarray(cam_rot)))
    cam7 = jnp.asarray(np.tile(np.concatenate([cam_pos, quat]), (t, 1)), dtype=jnp.float32)
    rgb, depth, seg = render.render_frames(
        jax.random.key(0),
        rot.astype(jnp.float32),
        trans.astype(jnp.float32),
        jnp.full((1, 3), scale, dtype=jnp.float32),
        jnp.asarray([[0.9, 0.2, 0.2]], dtype=jnp.float32),
        jnp.ones((1,), dtype=jnp.float32),
        cam7,
        fov=np.pi / 3,
        height=h,
        width=w,
    )
    return np.asarray(rgb), np.asarray(depth), np.asarray(seg), cam7


def test_render_cube_centered_and_occludes_background():
    rgb, depth, seg, _ = _single_cube_scene()
    mask = seg[0] == 1
    assert mask.any(), "cube not rendered"
    ys, xs = np.nonzero(mask)
    # centered cube projects around the principal point
    assert abs(xs.mean() - 32) < 3 and abs(ys.mean() - 32) < 3
    # cube depth ~ distance from camera (4) minus half extent, < background
    cube_depth = depth[0][mask]
    assert 3.0 < cube_depth.min() < 4.2
    assert depth[0][~mask].min() > cube_depth.max()
    # shading: cube pixels are reddish
    assert rgb[0][mask][:, 0].mean() > rgb[0][mask][:, 1].mean()


def test_render_keypoints_land_on_cube_mask():
    """The labeler's projected corners must fall inside (or on the border of)
    the rendered cube silhouette — same camera math by construction."""
    scale = 0.5
    rgb, depth, seg, cam7 = _single_cube_scene(scale=scale)
    obj7 = jnp.asarray(
        np.tile(np.array([0, 0, 0, 1.0, 0, 0, 0], dtype=np.float32), (2, 1))
    )  # identity pose, wxyz
    px = np.asarray(label_trajectory(obj7, cam7, scale, np.pi / 3, 64, 64))
    mask = seg[0] == 1
    ys, xs = np.nonzero(mask)
    for u, v in px[0]:
        assert xs.min() - 1.5 <= u <= xs.max() + 1.5, (u, xs.min(), xs.max())
        assert ys.min() - 1.5 <= v <= ys.max() + 1.5, (v, ys.min(), ys.max())


def test_render_occlusion_between_objects():
    """A nearer box must occlude a farther one along the same ray."""
    t = 1
    rot = jnp.tile(jnp.eye(3), (t, 2, 1, 1)).astype(jnp.float32)
    trans = jnp.asarray([[[2.0, 0.0, 0.0], [0.0, 0.0, 0.0]]], dtype=jnp.float32)
    cam_pos = np.array([5.0, 0.0, 0.0])
    z_cam = np.array([1.0, 0.0, 0.0])
    x_cam = np.array([0.0, -1.0, 0.0])
    y_cam = np.cross(z_cam, x_cam)
    quat = np.asarray(lie.rot_to_quat_wxyz(jnp.asarray(np.stack([x_cam, y_cam, z_cam], -1))))
    cam7 = jnp.asarray(np.concatenate([cam_pos, quat])[None], dtype=jnp.float32)
    _, depth, seg = render.render_frames(
        jax.random.key(1),
        rot, trans,
        jnp.full((2, 3), 0.4, dtype=jnp.float32),
        jnp.asarray([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1]], dtype=jnp.float32),
        jnp.ones((2,), dtype=jnp.float32),
        cam7, np.pi / 3, 48, 48,
    )
    seg = np.asarray(seg)[0]
    center = seg[24, 24]
    assert center == 1, f"front box should win the z-test, got {center}"
    assert not (seg == 2).any() or (seg == 2).sum() < (seg == 1).sum()


def test_generate_then_label_roundtrip(tmp_path):
    """generate_one_video writes a job dir the labeler consumes unchanged."""
    from perseus_tpu.datagen.label_dataset import LabelConfig, label_job

    cfg = VideoConfig(
        job_dir=str(tmp_path), resolution=48, frames=3,
        n_static_range=(2, 3), n_dynamic_range=(1, 1), seed=3,
    )
    job_path = generate_one_video(cfg, job_id="deadbeef")
    assert os.path.exists(os.path.join(job_path, "metadata.json"))
    with open(os.path.join(job_path, "metadata.json")) as f:
        meta = json.load(f)
    assert meta["instances"][0]["asset_id"] == "mjc"
    assert len(meta["camera"]["positions"]) == 3

    out = label_job(LabelConfig(job_dir=str(tmp_path), frames=3), "deadbeef")
    px = out["pixel_coordinates"]
    assert px.shape == (3, 8, 2)
    assert np.isfinite(px).all()
    # the cube spawns near the camera target, so its corners should project
    # inside (or near) the image
    assert (px > -48).all() and (px < 96).all()

    # rendered seg must contain the cube (instance index 0 -> label 1) in
    # at least one frame, and its pixels must coincide with projected corners
    segs = out["segmentation_images"]
    assert (segs == 1).any()


def test_value_noise_range_and_smoothness():
    n = np.asarray(render.value_noise(jax.random.key(0), 64, 64, cells=4))
    assert 0.0 <= n.min() and n.max() <= 1.0
    # smooth: neighboring pixels differ much less than the global range
    assert np.abs(np.diff(n, axis=0)).max() < 0.2


def test_six_faces_render_distinct_colors():
    """Each visible cube face must be identifiable by its albedo — the
    property that makes corner-identity regression well-posed (reference:
    mjc.mtl's six distinct face textures)."""
    from perseus_tpu.datagen.generate import CUBE_FACE_PALETTE

    t = 1
    rot = jnp.tile(jnp.eye(3), (t, 1, 1, 1)).astype(jnp.float32)
    trans = jnp.zeros((t, 1, 3), dtype=jnp.float32)
    face_colors = jnp.asarray(CUBE_FACE_PALETTE)[None]  # (1, 6, 3)

    def view_from(cam_pos):
        z_cam = cam_pos / np.linalg.norm(cam_pos)
        world_up = np.array([0.0, 0.0, 1.0])
        x_cam = np.cross(world_up, z_cam)
        if np.linalg.norm(x_cam) < 1e-6:
            x_cam = np.array([1.0, 0.0, 0.0])
        x_cam = x_cam / np.linalg.norm(x_cam)
        y_cam = np.cross(z_cam, x_cam)
        quat = np.asarray(lie.rot_to_quat_wxyz(jnp.asarray(np.stack([x_cam, y_cam, z_cam], -1))))
        cam7 = jnp.asarray(np.concatenate([cam_pos, quat])[None], dtype=jnp.float32)
        rgb, _, seg = render.render_frames(
            jax.random.key(0), rot, trans,
            jnp.full((1, 3), 0.5, dtype=jnp.float32),
            face_colors, jnp.ones((1,), dtype=jnp.float32),
            cam7, np.pi / 3, 48, 48, checker=0.0,
        )
        rgb, seg = np.asarray(rgb)[0], np.asarray(seg)[0]
        return rgb[seg == 1].mean(axis=0)

    # camera straight down each axis sees exactly one face
    views = {
        0: view_from(np.array([-4.0, 0.0, 0.0])),  # sees -x face
        1: view_from(np.array([4.0, 0.0, 0.0])),   # +x
        2: view_from(np.array([0.0, -4.0, 0.0])),  # -y
        3: view_from(np.array([0.0, 4.0, 0.0])),   # +y
        4: view_from(np.array([0.0, 0.0, -4.0])),  # -z
        5: view_from(np.array([0.0, 0.0, 4.0])),   # +z
    }
    for f, mean_rgb in views.items():
        # dominant channel of the rendered face matches its palette entry
        assert np.argmax(mean_rgb) == np.argmax(CUBE_FACE_PALETTE[f]), (f, mean_rgb)
    # all six faces pairwise distinguishable
    vals = np.stack(list(views.values()))
    for i in range(6):
        for j in range(i + 1, 6):
            assert np.abs(vals[i] - vals[j]).max() > 0.08, (i, j, vals[i], vals[j])


def test_ground_contact_keeps_bodies_above_floor():
    """With ground_contact, a dropped box never penetrates z=0 and settles;
    without it, ballistics carries it through the floor."""
    from perseus_tpu.datagen.generate import _integrate_pose, _support_height

    pos0 = np.array([0.0, 0.0, 2.0])
    rot0 = np.eye(3)
    vel = np.array([0.3, 0.0, 0.0])
    ang = np.array([0.0, 2.0, 0.0])
    he = np.full(3, 0.5)

    pos_c, rot_c = _integrate_pose(pos0, rot0, vel, ang, 60, 1.0 / 12.0, -9.8, half_extents=he)
    for p, r in zip(pos_c, rot_c):
        assert p[2] >= _support_height(r, he) - 1e-6
    # settled by the end: vertical motion died out near the floor
    assert abs(pos_c[-1][2] - _support_height(rot_c[-1], he)) < 0.15

    pos_b, _ = _integrate_pose(pos0, rot0, vel, ang, 60, 1.0 / 12.0, -9.8)
    assert pos_b[-1][2] < -5.0  # ballistic falls through


def test_camera_effects_photometric_only(tmp_path):
    """camera_effects must change ONLY the RGB files: depth, segmentation,
    and metadata (hence labels) are bit-identical to the effects-off render
    of the same seed, RGB stays in [0, 1], and the default stays off."""
    import json
    import os

    from perseus_tpu.data import schema
    from perseus_tpu.datagen.generate import VideoConfig, generate_one_video

    base = dict(resolution=48, frames=6, n_static_range=(1, 1),
                n_dynamic_range=(1, 1), max_objects=5, seed=11)
    off = generate_one_video(VideoConfig(job_dir=str(tmp_path / "off"), **base), job_id="j")
    on = generate_one_video(
        VideoConfig(job_dir=str(tmp_path / "on"), camera_effects=True, **base), job_id="j"
    )
    with open(os.path.join(off, "metadata.json")) as f, open(
        os.path.join(on, "metadata.json")
    ) as g:
        assert json.load(f) == json.load(g)
    changed = 0
    for i in range(6):
        np.testing.assert_array_equal(
            schema.load_depth_tiff(os.path.join(off, f"depth_{i:05d}.tiff")),
            schema.load_depth_tiff(os.path.join(on, f"depth_{i:05d}.tiff")),
        )
        np.testing.assert_array_equal(
            schema.load_segmentation_png(os.path.join(off, f"segmentation_{i:05d}.png")),
            schema.load_segmentation_png(os.path.join(on, f"segmentation_{i:05d}.png")),
        )
        a = schema.load_rgb_png(os.path.join(off, f"rgba_{i:05d}.png"))
        b = schema.load_rgb_png(os.path.join(on, f"rgba_{i:05d}.png"))
        assert b.min() >= 0.0 and b.max() <= 1.0
        changed += int(not np.array_equal(a, b))
    assert changed == 6  # the effects actually did something on every frame


def test_object_collisions_momentum_and_separation():
    """Head-on equal-mass impact in zero gravity, no ground: total momentum
    is conserved through the impulse and the boxes never interpenetrate.
    Axis-aligned head-on means the support-radius contact distance is EXACT
    box contact: center distance >= he_i.x + he_j.x at every frame."""
    from perseus_tpu.datagen.generate import _simulate_bodies

    he = np.full(3, 0.5)
    bodies = [
        dict(pos=np.array([-2.0, 0.0, 5.0]), rot=np.eye(3),
             vel=np.array([1.5, 0.0, 0.0]), ang=np.zeros(3), he=he, movable=True),
        dict(pos=np.array([2.0, 0.0, 5.0]), rot=np.eye(3),
             vel=np.array([-1.5, 0.0, 0.0]), ang=np.zeros(3), he=he, movable=True),
    ]
    pos, _ = _simulate_bodies(bodies, 40, 1.0 / 12.0, gravity=0.0, ground=False)
    r = float(he[0])  # support radius of an axis-aligned box along x
    dists = np.linalg.norm(pos[:, 0] - pos[:, 1], axis=-1)
    assert dists.min() >= 2 * r - 1e-6, dists.min()
    # they actually met and bounced back apart
    assert dists[0] > 2.5 * r and dists[-1] > 2.5 * r and dists.min() < 2 * r + 0.25
    # momentum: velocities from the recorded trajectory (symmetric setup ->
    # total x-velocity stays ~0, so the midpoint barely moves)
    mid = 0.5 * (pos[:, 0] + pos[:, 1])
    assert np.abs(mid - mid[0]).max() < 1e-6


def test_object_collisions_static_infinite_mass():
    """A movable body bouncing off a STATIC one: the static never moves and
    the movable is pushed out (no interpenetration)."""
    from perseus_tpu.datagen.generate import _simulate_bodies

    he = np.full(3, 0.5)
    bodies = [
        dict(pos=np.array([-3.0, 0.0, 0.5]), rot=np.eye(3),
             vel=np.array([2.0, 0.0, 0.0]), ang=np.zeros(3), he=he, movable=True),
        dict(pos=np.array([0.0, 0.0, 0.5]), rot=np.eye(3),
             vel=np.zeros(3), ang=np.zeros(3), he=he, movable=False),
    ]
    pos, _ = _simulate_bodies(bodies, 48, 1.0 / 12.0, gravity=0.0, ground=False)
    np.testing.assert_array_equal(pos[:, 1], np.tile(bodies[1]["pos"], (48, 1)))
    dists = np.linalg.norm(pos[:, 0] - pos[:, 1], axis=-1)
    assert dists.min() >= 2 * float(he[0]) - 1e-6  # exact box contact along x


def test_generated_video_has_no_cube_interpenetration(tmp_path):
    """End-to-end: a generated video's metadata never has a distractor
    center within the cube+distractor bounding-sphere sum (VERDICT round-3
    item 7: tossed distractors can't interpenetrate the cube)."""
    import json
    import os

    from perseus_tpu.datagen.generate import VideoConfig, generate_one_video

    job = generate_one_video(
        VideoConfig(
            job_dir=str(tmp_path), resolution=48, frames=24,
            n_static_range=(3, 4), n_dynamic_range=(2, 3), max_objects=10, seed=3,
        ),
        job_id="colcheck",
    )
    with open(os.path.join(job, "metadata.json")) as f:
        meta = json.load(f)
    def _wxyz_to_rot(q):
        w, x, y, z = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    insts = meta["instances"]
    cube = np.asarray(insts[0]["positions"])
    cube_he = np.asarray(insts[0].get("half_extents", [insts[0]["abs_scale"]] * 3))
    cube_rots = [_wxyz_to_rot(q) for q in insts[0]["quaternions"]]
    for inst in insts[1:]:
        p = np.asarray(inst["positions"])
        he = np.asarray(inst.get("half_extents", [inst.get("abs_scale", 0.5)] * 3))
        rots = [_wxyz_to_rot(q) for q in inst["quaternions"]]
        # support-radius separation along the center line (the contact model
        # _simulate_bodies enforces: no face-on interpenetration, no phantom
        # bounding-sphere contacts)
        for f in range(p.shape[0]):
            d = cube[f] - p[f]
            dist = float(np.linalg.norm(d))
            n = d / max(dist, 1e-9)
            r_cube = float(np.abs(n @ cube_rots[f]) @ cube_he)
            r = float(np.abs(n @ rots[f]) @ he)
            assert dist >= (r_cube + r) - 1e-3, (inst.get("asset_id"), f, dist, r_cube + r)


def test_distractor_vertex_jitter():
    """Every distractor gets a unique jittered hexahedron bounded by the
    jitter fraction; the cube (instance 0) stays an exact box; jittered
    statics still rest exactly on the floor at frame 0."""
    import dataclasses

    from perseus_tpu.datagen import render
    from perseus_tpu.datagen.generate import VideoConfig, _simulate

    cfg = VideoConfig(
        job_dir="/tmp/unused", resolution=32, frames=2,
        n_static_range=(3, 3), n_dynamic_range=(2, 2), seed=5,
    )
    rng = np.random.default_rng(cfg.seed)
    scene = _simulate(cfg, rng)
    verts = scene["verts_local"]  # (O, 8, 3)
    he = scene["half_extents"]

    # cube exact
    np.testing.assert_array_equal(verts[0], render.shape_vertices(he[0], "box"))

    # distractors: unique, and within jitter bound of SOME base family
    j = cfg.distractor_vertex_jitter
    for o in range(1, verts.shape[0]):
        for o2 in range(o + 1, verts.shape[0]):
            assert np.abs(verts[o] - verts[o2]).max() > 1e-9
        dev = min(
            np.max(np.abs(verts[o] - render.shape_vertices(he[o], fam)) / he[o][None, :])
            for fam in ("box", "wedge", "pyramid")
        )
        assert dev <= j + 1e-9
        assert dev > 0.0  # jitter actually applied

    # statics (movable=False -> constant trajectory) rest on the floor:
    # lowest rotated+translated vertex at z ~ 0 in frame 0
    pos0, rot0 = scene["positions"][0], scene["rotations"][0]
    statics = [
        o for o in range(1, verts.shape[0])
        if np.allclose(scene["positions"][:, o], scene["positions"][0, o])
    ]
    assert len(statics) == 3
    for o in statics:
        world_z = (rot0[o] @ verts[o].T)[2] + pos0[o][2]
        assert abs(world_z.min()) < 1e-6

    # jitter off -> exact family shapes return
    cfg_off = dataclasses.replace(cfg, distractor_vertex_jitter=0.0)
    scene_off = _simulate(cfg_off, np.random.default_rng(cfg.seed))
    v_off, he_off = scene_off["verts_local"], scene_off["half_extents"]
    for o in range(1, v_off.shape[0]):
        dev = min(
            np.max(np.abs(v_off[o] - render.shape_vertices(he_off[o], fam)))
            for fam in ("box", "wedge", "pyramid")
        )
        assert dev == 0.0
