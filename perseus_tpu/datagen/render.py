"""JAX-native box-scene rasterizer for synthetic data generation.

The reference generates training videos with Kubric (PyBullet physics +
Blender/Cycles rendering — reference: data_generation/generate_one_video.py).
Those are CPU/GPU-host tools that cannot run here and are not TPU work; this
module provides the TPU-native capability instead: a vectorized z-buffer
rasterizer of posed boxes (the cube + box distractors) written entirely in
jax.numpy, so whole trajectories render as one jitted program (lax.map over
frames, lax.scan over objects).

Fidelity target is the *data contract*, not photorealism: RGB with Lambert
shading over a value-noise background, metric depth, and an exact
instance-segmentation mask — the three layers the reference renders
(generate_one_video.py:336) — with camera/projection math identical to the
labeler's (datagen/labeling.py), so projected keypoints align with rendered
pixels by construction. Scenes built with this renderer flow through the
real pipeline: label -> merge -> prune -> train.

This renderer is the pipeline's only rendering backend (there is no
Kubric/Blender path in this framework); datagen/generate.py orchestrates it.
Cube faces carry six distinct albedos plus a procedural checker so corner
identity is learnable (the role of the reference mjc asset's six face
textures).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from perseus_tpu import camera, lie

__all__ = ["BOX_FACES", "box_vertices", "value_noise", "render_frames"]

# Triangles over the 8 corners in cube_corners() ordering: index bit layout
# 4*(x>0) + 2*(y>0) + (z>0). Two triangles per face.
BOX_FACES = np.array(
    [
        [0, 1, 3], [0, 3, 2],  # -x
        [4, 6, 7], [4, 7, 5],  # +x
        [0, 4, 5], [0, 5, 1],  # -y
        [2, 3, 7], [2, 7, 6],  # +y
        [0, 2, 6], [0, 6, 4],  # -z
        [1, 5, 7], [1, 7, 3],  # +z
    ],
    dtype=np.int32,
)

_CORNER_SIGNS = np.array(
    [
        [-1, -1, -1], [-1, -1, 1], [-1, 1, -1], [-1, 1, 1],
        [1, -1, -1], [1, -1, 1], [1, 1, -1], [1, 1, 1],
    ],
    dtype=np.float32,
)

# face index of each triangle (two triangles per face, in BOX_FACES order)
_TRI_FACE = np.arange(12, dtype=np.int32) // 2

# per-triangle corner UVs inside the face's unit square. Every face's quad
# is listed cyclically [a, b, c, d] as triangles [a, b, c], [a, c, d], so the
# UV pattern is shared: a=(0,0), b=(1,0), c=(1,1), d=(0,1).
_TRI_UV = np.array(
    [[[0, 0], [1, 0], [1, 1]], [[0, 0], [1, 1], [0, 1]]] * 6,
    dtype=np.float32,
)  # (12, 3, 2)


def box_vertices(half_extents: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) half extents -> (..., 8, 3) corners, cube_corners ordering."""
    return half_extents[..., None, :] * jnp.asarray(_CORNER_SIGNS)


def value_noise(key: jax.Array, h: int, w: int, cells: int = 8) -> jnp.ndarray:
    """Smooth [0, 1] noise: bilinear upsample of a random coarse grid."""
    grid = jax.random.uniform(key, (cells + 1, cells + 1))
    ys = jnp.linspace(0.0, cells, h)
    xs = jnp.linspace(0.0, cells, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, cells - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, cells - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    g00 = grid[y0[:, None], x0[None, :]]
    g01 = grid[y0[:, None], x0[None, :] + 1]
    g10 = grid[y0[:, None] + 1, x0[None, :]]
    g11 = grid[y0[:, None] + 1, x0[None, :] + 1]
    return (1 - fy) * ((1 - fx) * g00 + fx * g01) + fy * ((1 - fx) * g10 + fx * g11)


def _shade(normals_world: jnp.ndarray, base_color: jnp.ndarray, light_dir: jnp.ndarray):
    """Two-sided Lambert: (F, 3) normals, (F, 3) per-tri albedo -> colors."""
    lam = jnp.abs(normals_world @ light_dir)
    return jnp.clip(base_color * (0.35 + 0.65 * lam[:, None]), 0.0, 1.0)


def render_frames(
    key: jax.Array,
    obj_rot: jnp.ndarray,  # (T, O, 3, 3) object-to-world rotations
    obj_trans: jnp.ndarray,  # (T, O, 3)
    half_extents: jnp.ndarray,  # (O, 3)
    colors: jnp.ndarray,  # (O, 3) per-object OR (O, 6, 3) per-face albedo
    active: jnp.ndarray,  # (O,) 0/1 — padding mask for variable object count
    cam_pose7_wxyz: jnp.ndarray,  # (T, 7) Blender camera-to-world
    fov: float,
    height: int,
    width: int,
    light_dir: jnp.ndarray | None = None,
    far: float = 20.0,
    checker: float = 0.3,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Renders T frames of O boxes.

    Returns (rgb (T, H, W, 3) in [0, 1], depth (T, H, W) camera-frame z,
    seg (T, H, W) int32 with instance index + 1, background 0). Object index
    order matches the metadata "instances" list so the dataset loader's
    ``seg == asset_id + 1`` binarization works unchanged
    (reference: perseus/detector/data.py:88-91).

    ``colors`` may be per-face (O, 6, 3): six DISTINCT albedos make the cube
    face-identifiable — the property that makes corner-identity regression
    well-posed, which the reference gets from the mjc asset's six face
    textures (reference: data_generation/assets/mjc.mtl, six map_Kd entries).
    ``checker`` additionally modulates each face with a perspective-correct
    2x2 checkerboard of the given amplitude (0 disables), the procedural
    stand-in for image textures.
    """
    t, o = obj_rot.shape[:2]
    dtype = obj_trans.dtype
    if colors.ndim == 2:  # per-object albedo -> same albedo on all six faces
        colors = jnp.broadcast_to(colors[:, None, :], (colors.shape[0], 6, 3))
    if light_dir is None:
        light_dir = jnp.asarray([0.3, -0.5, 0.8], dtype=dtype)
    light_dir = light_dir / jnp.linalg.norm(light_dir)

    k = camera.intrinsics_from_fov(jnp.asarray(fov, dtype=dtype), height, width)
    faces = jnp.asarray(BOX_FACES)

    # background: smooth colored noise; depth = far plane with mild noise
    kb, kc, kd = jax.random.split(key, 3)
    bg_tint = jax.random.uniform(kc, (3,), minval=0.2, maxval=0.8)
    noise = value_noise(kb, height, width)
    bg_rgb = jnp.clip(bg_tint[None, None, :] * (0.5 + 0.7 * noise[..., None]), 0.0, 1.0)
    bg_depth = far * (0.9 + 0.2 * value_noise(kd, height, width))

    cam = lie.pose7_wxyz_to_se3(cam_pose7_wxyz)  # (T,) batched SE3
    cam_cv = camera.blender_to_opencv_pose(cam)

    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2) (u, v)

    def render_one(frame):
        rot_f, trans_f, cam_rot, cam_trans = frame  # (O,3,3) (O,3) (3,3) (3,)

        verts_local = box_vertices(half_extents)  # (O, 8, 3)
        verts_world = (
            jnp.einsum("oij,ovj->ovi", rot_f, verts_local) + trans_f[:, None, :]
        )
        # world -> opencv camera frame
        verts_cam = jnp.einsum("ji,ovj->ovi", cam_rot, verts_world - cam_trans)
        z = verts_cam[..., 2]
        uv = camera.project(k, verts_cam)  # (O, 8, 2)

        # per-face world normals and shaded colors
        tri_w = verts_world[:, faces]  # (O, 12, 3, 3)
        n = jnp.cross(tri_w[..., 1, :] - tri_w[..., 0, :], tri_w[..., 2, :] - tri_w[..., 0, :])
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
        tri_albedo = colors[:, jnp.asarray(_TRI_FACE)]  # (O, 12, 3)
        face_colors = jax.vmap(_shade, in_axes=(0, 0, None))(n, tri_albedo, light_dir)

        def raster_object(buffers, obj):
            zbuf, cbuf, sbuf = buffers
            o_uv, o_z, o_colors, o_idx, o_active = obj
            a = o_uv[faces[:, 0]]  # (12, 2)
            b = o_uv[faces[:, 1]]
            c = o_uv[faces[:, 2]]
            za, zb, zc = o_z[faces[:, 0]], o_z[faces[:, 1]], o_z[faces[:, 2]]

            def edge(p, q):
                # (12, H, W): cross(q - p, px - p)
                d = q - p
                return (
                    d[:, None, None, 0] * (px[None, ..., 1] - p[:, None, None, 1])
                    - d[:, None, None, 1] * (px[None, ..., 0] - p[:, None, None, 0])
                )

            e_ab = edge(a, b)
            e_bc = edge(b, c)
            e_ca = edge(c, a)
            area = e_ab + e_bc + e_ca  # signed 2x area, constant per triangle
            valid_tri = (jnp.abs(area[:, 0, 0]) > 1e-8) & (za > 1e-3) & (zb > 1e-3) & (zc > 1e-3)
            s = jnp.sign(area[:, 0:1, 0:1])
            inside = (e_ab * s >= 0) & (e_bc * s >= 0) & (e_ca * s >= 0)
            inside = inside & valid_tri[:, None, None] & (o_active > 0.5)

            # perspective-correct depth: interpolate 1/z with screen barycentrics
            inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-8, area, 1.0)
            lam_a = e_bc * inv_area
            lam_b = e_ca * inv_area
            lam_c = e_ab * inv_area
            inv_z = (
                lam_a * (1.0 / za)[:, None, None]
                + lam_b * (1.0 / zb)[:, None, None]
                + lam_c * (1.0 / zc)[:, None, None]
            )
            tri_z = 1.0 / jnp.maximum(inv_z, 1e-6)
            tri_z = jnp.where(inside, tri_z, jnp.inf)

            # nearest triangle of this object per pixel
            best = jnp.argmin(tri_z, axis=0)  # (H, W)
            best_z = jnp.take_along_axis(tri_z, best[None], axis=0)[0]
            best_rgb = o_colors[best]  # (H, W, 3)

            if checker > 0.0:
                # perspective-correct face UVs: interpolate uv/z, divide by 1/z
                uv_tri = jnp.asarray(_TRI_UV)  # (12, 3, 2)
                uq = (
                    lam_a[:, None] * (uv_tri[:, 0, :, None, None] / za[:, None, None, None])
                    + lam_b[:, None] * (uv_tri[:, 1, :, None, None] / zb[:, None, None, None])
                    + lam_c[:, None] * (uv_tri[:, 2, :, None, None] / zc[:, None, None, None])
                )  # (12, 2, H, W)
                uv_pc = uq / jnp.maximum(inv_z[:, None], 1e-6)
                u_b = jnp.take_along_axis(uv_pc[:, 0], best[None], axis=0)[0]
                v_b = jnp.take_along_axis(uv_pc[:, 1], best[None], axis=0)[0]
                cell = (jnp.floor(u_b * 2) + jnp.floor(v_b * 2)) % 2.0
                best_rgb = jnp.clip(
                    best_rgb * (1.0 - checker / 2 + checker * cell)[..., None], 0.0, 1.0
                )

            win = best_z < zbuf
            zbuf = jnp.where(win, best_z, zbuf)
            cbuf = jnp.where(win[..., None], best_rgb, cbuf)
            sbuf = jnp.where(win, o_idx + 1, sbuf)
            return (zbuf, cbuf, sbuf), None

        init = (bg_depth, bg_rgb, jnp.zeros((height, width), dtype=jnp.int32))
        (zbuf, cbuf, sbuf), _ = jax.lax.scan(
            raster_object,
            init,
            (uv, z, face_colors, jnp.arange(o, dtype=jnp.int32), active),
        )
        return cbuf, zbuf, sbuf

    rgb, depth, seg = jax.lax.map(
        render_one, (obj_rot, obj_trans, cam_cv.rot, cam_cv.trans)
    )
    return rgb, depth, seg
