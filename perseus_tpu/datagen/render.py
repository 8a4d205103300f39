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

__all__ = [
    "BOX_FACES",
    "box_vertices",
    "shape_vertices",
    "value_noise",
    "fbm_texture",
    "cells_texture",
    "panorama_texture",
    "render_frames",
]

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


# Distractor shape families beyond the box (the non-box mesh role of the
# reference's GSO asset distractors, generate_one_video.py:229-245): each is
# an 8-vertex deformation of the box so the 12-triangle topology is shared —
# collapsed faces become degenerate triangles the rasterizer culls by area.
# Vertex order follows _CORNER_SIGNS: index bit layout 4*(x>0)+2*(y>0)+(z>0),
# so odd indices (1,3,5,7) are the +z (top) corners.
def shape_vertices(half_extents: jnp.ndarray, shape: str) -> np.ndarray:
    """(3,) half extents -> (8, 3) vertices for 'box' | 'wedge' | 'pyramid'."""
    v = np.asarray(_CORNER_SIGNS) * np.asarray(half_extents)[None, :]
    if shape == "box":
        return v
    if shape == "wedge":  # triangular prism: top corners pinch to a y=0 ridge
        v[[1, 3, 5, 7], 1] = 0.0
        return v
    if shape == "pyramid":  # top face collapses to the apex point
        v[[1, 3, 5, 7], 0] = 0.0
        v[[1, 3, 5, 7], 1] = 0.0
        return v
    raise ValueError(f"unknown shape {shape!r}")


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


def fbm_texture(
    key: jax.Array,
    size: int,
    colors: jnp.ndarray,  # (2, 3) palette endpoints lerped by the noise field
    octaves: int = 3,
    stripes: float = 0.0,
) -> jnp.ndarray:
    """Procedural (size, size, 3) image texture: multi-octave value noise
    (fBm) mapped through a two-color palette, optionally modulated by random
    diagonal stripes. These per-video textures play the role of the
    reference's HDRI dome backgrounds / image textures
    (generate_one_video.py:229-245) — rendered scenes sample them as real
    images (dome + ground), not as flat tints."""
    keys = jax.random.split(key, octaves + 2)
    field = jnp.zeros((size, size))
    amp, total = 1.0, 0.0
    for i in range(octaves):
        field = field + amp * value_noise(keys[i], size, size, cells=4 * (2**i))
        total += amp
        amp *= 0.5
    field = field / total
    if stripes > 0.0:
        ang = jax.random.uniform(keys[-2], (), minval=0.0, maxval=np.pi)
        freq = jax.random.uniform(keys[-1], (), minval=4.0, maxval=12.0)
        xs = jnp.linspace(0.0, 1.0, size)
        phase = jnp.cos(ang) * xs[None, :] + jnp.sin(ang) * xs[:, None]
        field = field * (1.0 - stripes / 2 + stripes / 2 * jnp.sin(2 * np.pi * freq * phase))
    field = jnp.clip(field, 0.0, 1.0)
    return colors[0] * (1.0 - field[..., None]) + colors[1] * field[..., None]


def cells_texture(
    key: jax.Array,
    size: int,
    colors: jnp.ndarray,  # (2, 3) palette endpoints lerped by the cell shade
    n_cells: int = 24,
) -> jnp.ndarray:
    """Voronoi-style cellular (size, size, 3) tile: random toroidal seed
    points, per-cell shade, darkened cell borders. Tiles seamlessly (sampled
    with wrap coords). Adds the tiled-floor / paver texture family the
    reference gets from its HDRI/asset image textures
    (generate_one_video.py:119-134) and an fBm field can't produce."""
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (n_cells, 2))
    shades = jax.random.uniform(k2, (n_cells,))
    ys = jnp.linspace(0.0, 1.0, size)
    xs = jnp.linspace(0.0, 1.0, size)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    dy = jnp.abs(yy[..., None] - pts[None, None, :, 0])
    dy = jnp.minimum(dy, 1.0 - dy)  # toroidal metric -> seamless tile
    dx = jnp.abs(xx[..., None] - pts[None, None, :, 1])
    dx = jnp.minimum(dx, 1.0 - dx)
    d2 = dy * dy + dx * dx
    field = shades[jnp.argmin(d2, axis=-1)]
    d_sorted = jnp.sort(d2, axis=-1)
    edge = jnp.clip(
        (jnp.sqrt(d_sorted[..., 1]) - jnp.sqrt(d_sorted[..., 0])) / 0.04, 0.0, 1.0
    )
    field = jnp.clip(field * (0.55 + 0.45 * edge), 0.0, 1.0)
    return colors[0] * (1.0 - field[..., None]) + colors[1] * field[..., None]


def panorama_texture(
    key: jax.Array,
    size: int,
    colors: jnp.ndarray,  # (2, 3) zenith / horizon palette endpoints
    octaves: int = 3,
) -> jnp.ndarray:
    """Procedural equirect sky panorama — the HDRI-dome role (the reference
    domes every scene with a random HDRI image,
    generate_one_video.py:119-134): a zenith->nadir vertical gradient
    between the palette endpoints, multi-octave clouds, a bright horizon
    band, and a sun disk with glow at a random azimuth/elevation. Rows are
    elevation (0 = zenith, 1 = nadir), columns azimuth; sample with
    ``_sample_pan`` (azimuth wraps, elevation clamps)."""
    kc, ks, kh, kg = jax.random.split(key, 4)
    v = jnp.linspace(0.0, 1.0, size)[:, None]
    base = colors[0][None, None] * (1.0 - v)[..., None] + colors[1][None, None] * v[..., None]
    keys = jax.random.split(kc, octaves)
    field = jnp.zeros((size, size))
    amp, total = 1.0, 0.0
    for i in range(octaves):
        field = field + amp * value_noise(keys[i], size, size, cells=4 * (2**i))
        total += amp
        amp *= 0.5
    field = field / total
    cloud_amt = jax.random.uniform(kh, (), minval=0.15, maxval=0.6)
    cloud_col = jnp.ones(3) * jax.random.uniform(kg, (), minval=0.7, maxval=1.0)
    w = jnp.clip((field - 0.55) / 0.25, 0.0, 1.0) * cloud_amt
    img = base * (1.0 - w[..., None]) + cloud_col[None, None] * w[..., None]
    # the dome meets the ground plane at v = 0.5: brighten the seam like the
    # atmospheric scattering band real panoramas have there
    img = img + 0.25 * jnp.exp(-(((v - 0.5) / 0.08) ** 2))[..., None]
    su = jax.random.uniform(ks, (2,))
    sun_u, sun_v = su[0], 0.1 + 0.35 * su[1]  # sun in the upper half
    u = jnp.linspace(0.0, 1.0, size)[None, :]
    du = jnp.abs(u - sun_u)
    du = jnp.minimum(du, 1.0 - du)  # azimuth wraps
    d2 = du * du + (v - sun_v) ** 2
    img = img + (1.5 * jnp.exp(-d2 / 4e-4) + 0.3 * jnp.exp(-d2 / 0.02))[..., None]
    return jnp.clip(img, 0.0, 1.0)


def _sample_pan(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of an equirect panorama: u (azimuth) wraps, v
    (elevation) clamps to [0, 1] — a vertical gradient must not wrap."""
    s = tex.shape[0]
    x = (u % 1.0) * (s - 1)
    y = jnp.clip(v, 0.0, 1.0) * (s - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, s - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, s - 2)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    t00 = tex[y0, x0]
    t01 = tex[y0, x0 + 1]
    t10 = tex[y0 + 1, x0]
    t11 = tex[y0 + 1, x0 + 1]
    return (1 - fy) * ((1 - fx) * t00 + fx * t01) + fy * ((1 - fx) * t10 + fx * t11)


def _sample_tile(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear wrap-sample of a (S, S, 3) tile at texture coords u, v (any
    real scale; 1.0 spans the tile)."""
    s = tex.shape[0]
    x = (u % 1.0) * (s - 1)
    y = (v % 1.0) * (s - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, s - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, s - 2)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    t00 = tex[y0, x0]
    t01 = tex[y0, x0 + 1]
    t10 = tex[y0 + 1, x0]
    t11 = tex[y0 + 1, x0 + 1]
    return (1 - fy) * ((1 - fx) * t00 + fx * t01) + fy * ((1 - fx) * t10 + fx * t11)


def _shade(
    normals_world: jnp.ndarray,
    base_color: jnp.ndarray,
    light_dir: jnp.ndarray,
    view_dir: jnp.ndarray | None = None,
    spec_strength: jnp.ndarray | float = 0.0,
    shininess: jnp.ndarray | float = 32.0,
    light_intensity: jnp.ndarray | float = 1.0,
):
    """Two-sided Blinn-Phong: (F, 3) normals, (F, 3) per-tri albedo.

    `view_dir` (F, 3) unit vectors from surface toward the camera enable the
    specular term; `spec_strength`/`shininess` are the per-video material
    randomization (the Principled-BSDF roughness/specular role, reference:
    generate_one_video.py:281-295 — low shininess ~ high roughness)."""
    lam = jnp.abs(normals_world @ light_dir)
    out = base_color * light_intensity * (0.35 + 0.65 * lam[:, None])
    if view_dir is not None:
        half = light_dir[None, :] + view_dir
        half = half / (jnp.linalg.norm(half, axis=-1, keepdims=True) + 1e-9)
        spec = jnp.abs(jnp.sum(normals_world * half, axis=-1)) ** shininess
        out = out + spec_strength * light_intensity * spec[:, None]
    return jnp.clip(out, 0.0, 1.0)


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
    verts_local: jnp.ndarray | None = None,
    spec_strength: jnp.ndarray | float = 0.0,
    shininess: jnp.ndarray | float = 32.0,
    light_intensity: jnp.ndarray | float = 1.0,
    ground: bool = False,
    shadow_strength: jnp.ndarray | float = 0.0,
    sky_texture: jnp.ndarray | None = None,
    ground_texture: jnp.ndarray | None = None,
    ground_tex_scale: float = 4.0,
    sky_mode: str = "tile",
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Renders T frames of O convex 8-vertex solids (boxes by default).

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
    2x2 checkerboard of the given amplitude (0 disables).

    Fidelity features (each playing a reference Cycles-render role,
    generate_one_video.py:229-317):
      * ``verts_local`` (O, 8, 3) overrides the box corners so distractors
        can be wedges/pyramids (shape_vertices) — the non-box GSO-mesh role;
      * ``spec_strength``/``shininess`` add a Blinn-Phong specular term —
        the randomized Principled-BSDF material role;
      * ``ground=True`` ray-casts a textured z=0 ground plane with correct
        depth and directional cast shadows (``shadow_strength``) from every
        active object;
      * ``sky_texture``/``ground_texture`` are per-video image tiles
        (fbm_texture) sampled as a dome + floor — the HDRI background role.
    """
    t, o = obj_rot.shape[:2]
    dtype = obj_trans.dtype
    if colors.ndim == 2:  # per-object albedo -> same albedo on all six faces
        colors = jnp.broadcast_to(colors[:, None, :], (colors.shape[0], 6, 3))
    if light_dir is None:
        light_dir = jnp.asarray([0.3, -0.5, 0.8], dtype=dtype)
    light_dir = light_dir / jnp.linalg.norm(light_dir)

    k = camera.intrinsics_from_fov(jnp.asarray(fov, dtype=dtype), height, width)
    fx, fy, cx, cy = k.fx, k.fy, k.cx, k.cy
    faces = jnp.asarray(BOX_FACES)
    if verts_local is None:
        verts_local = box_vertices(half_extents)  # (O, 8, 3)

    # static fallback background (no textures): smooth colored noise
    kb, kc, kd = jax.random.split(key, 3)
    bg_tint = jax.random.uniform(kc, (3,), minval=0.2, maxval=0.8)
    noise = value_noise(kb, height, width)
    flat_bg_rgb = jnp.clip(bg_tint[None, None, :] * (0.5 + 0.7 * noise[..., None]), 0.0, 1.0)
    bg_depth = far * (0.9 + 0.2 * value_noise(kd, height, width))

    cam = lie.pose7_wxyz_to_se3(cam_pose7_wxyz)  # (T,) batched SE3
    cam_cv = camera.blender_to_opencv_pose(cam)

    ys = jnp.arange(height, dtype=dtype)
    xs = jnp.arange(width, dtype=dtype)
    px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2) (u, v)
    # unnormalized camera-frame ray directions with z=1, so the ray
    # parameter IS the camera z-depth
    dirs_cam = jnp.stack(
        [(px[..., 0] - cx) / fx, (px[..., 1] - cy) / fy, jnp.ones((height, width), dtype)],
        axis=-1,
    )  # (H, W, 3)

    def background(cam_rot, cam_trans, rot_f, trans_f):
        """Per-frame ray-cast background: textured sky dome + z=0 ground
        plane with cast shadows. Returns (rgb, depth)."""
        d_world = jnp.einsum("ij,hwj->hwi", cam_rot, dirs_cam)
        dz = d_world[..., 2]
        t_g = -cam_trans[2] / jnp.where(dz < -1e-6, dz, -1e-6)
        hits_ground = (dz < -1e-6) & (t_g > 0.0) & (t_g < far)

        # sky: sample the dome texture by ray azimuth/elevation
        d_norm = d_world / (jnp.linalg.norm(d_world, axis=-1, keepdims=True) + 1e-9)
        az = jnp.arctan2(d_norm[..., 1], d_norm[..., 0]) / (2 * np.pi) + 0.5
        el = 0.5 - jnp.arcsin(jnp.clip(d_norm[..., 2], -1.0, 1.0)) / np.pi
        if sky_texture is None:
            sky_rgb = flat_bg_rgb
        elif sky_mode == "pan":
            # equirect panorama: azimuth wraps, elevation maps 0=zenith ->
            # 1=nadir exactly once (panorama_texture's row convention)
            sky_rgb = _sample_pan(sky_texture, az, el)
        else:
            sky_rgb = _sample_tile(sky_texture, az * 2.0, el * 2.0)

        # ground: texture by world xy, Lambert from the +z normal
        p = cam_trans[None, None, :] + t_g[..., None] * d_world  # (H, W, 3)
        if ground_texture is not None:
            g_tex = _sample_tile(
                ground_texture, p[..., 0] / ground_tex_scale, p[..., 1] / ground_tex_scale
            )
        else:
            g_tex = flat_bg_rgb
        g_rgb = g_tex * light_intensity * (0.45 + 0.55 * jnp.abs(light_dir[2]))

        # cast shadows: march from each ground point toward the light and
        # slab-test every active object's bounding box
        def occludes(rot_o, trans_o, he_o, act_o):
            q = jnp.einsum("ji,hwj->hwi", rot_o, p - trans_o)  # local point
            d = rot_o.T @ light_dir
            inv = 1.0 / jnp.where(jnp.abs(d) > 1e-6, d, jnp.where(d >= 0, 1e-6, -1e-6))
            t1 = (-he_o - q) * inv[None, None, :]
            t2 = (he_o - q) * inv[None, None, :]
            tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
            tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
            return (tmax >= jnp.maximum(tmin, 1e-3)) & (act_o > 0.5)

        shadowed = jnp.any(
            jax.vmap(occludes)(rot_f, trans_f, half_extents, active), axis=0
        )
        g_rgb = g_rgb * (1.0 - shadow_strength * shadowed[..., None])

        rgb = jnp.where(hits_ground[..., None], g_rgb, sky_rgb)
        depth = jnp.where(hits_ground, t_g, bg_depth)
        return jnp.clip(rgb, 0.0, 1.0), depth

    def render_one(frame):
        rot_f, trans_f, cam_rot, cam_trans = frame  # (O,3,3) (O,3) (3,3) (3,)

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
        centroid = jnp.mean(tri_w, axis=-2)  # (O, 12, 3)
        view = cam_trans[None, None, :] - centroid
        view = view / (jnp.linalg.norm(view, axis=-1, keepdims=True) + 1e-9)
        face_colors = jax.vmap(
            lambda nn, aa, vv: _shade(
                nn, aa, light_dir, vv, spec_strength, shininess, light_intensity
            )
        )(n, tri_albedo, view)

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

        if ground or sky_texture is not None:
            frame_bg_rgb, frame_bg_depth = background(cam_rot, cam_trans, rot_f, trans_f)
        else:
            frame_bg_rgb, frame_bg_depth = flat_bg_rgb, bg_depth
        init = (frame_bg_depth, frame_bg_rgb, jnp.zeros((height, width), dtype=jnp.int32))
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
