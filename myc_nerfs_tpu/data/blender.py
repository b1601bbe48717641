"""Blender transforms.json datasets for the three stacks.

TPU-native re-implementation of the three reference loaders (SURVEY.md L5):
- barf (barf-myc/data/{base,blender}.py): whole-split prefetch into one
  batch, RGBA->RGB background blend, flip+invert pose convention
- tensorf (tensorf-myc/dataLoader/blender.py): precomputed flat ray store
  over all pixels of all images, blender2opencv poses
- jnerf (jnerf-myc/python/jnerf/dataset/dataset.py): train = train+val JSONs
  merged, val = every 10th frame (:156-157), nerf->ngp pose conversion with
  NERF_SCALE 0.33 + offset 0.5, metadata focal/principal point, infinite
  shuffled pixel batches with on-the-fly ray generation (:116-125, 230-246)

Host-side (numpy + PIL); arrays land on device when the trainer takes them.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..geom import conventions
from ..geom import pose as pose_lib
from ..geom import rays as rays_lib

NERF_SCALE = 0.33  # jnerf dataset.py (matrix_nerf2ngp t scale)


@dataclasses.dataclass
class BlenderScene:
    images: np.ndarray          # [N, H, W, 3] float32 in [0, 1]
    alphas: Optional[np.ndarray]  # [N, H, W, 1] or None
    c2w: np.ndarray             # [N, 4, 4] raw Blender camera-to-world
    H: int
    W: int
    focal: float
    camera_angle_x: float
    file_paths: List[str]
    # json-level intrinsics (jnerf dataset.py:180-211): distortion, principal
    # point, explicit focal lengths. Zero/None when absent (blender default).
    intrinsics: Optional[Dict] = None


def _load_image(path: str, wh: Optional[Tuple[int, int]] = None):
    if path.endswith(".bin"):
        # packed fp16 RGBA with int32 h/w header, stored LINEAR
        # (read_image, dataset.py:54-61); converted to sRGB so all loaded
        # images share the PNG color space (write_image does the inverse,
        # dataset.py:63-79) via utils/color.
        import struct

        from ..utils.color import linear_to_srgb

        with open(path, "rb") as f:
            raw = f.read()
        h, w = struct.unpack("ii", raw[:8])
        arr = np.frombuffer(raw, np.float16, count=h * w * 4, offset=8)
        arr = arr.astype(np.float32).reshape(h, w, 4).copy()
        arr[..., :3] = np.asarray(linear_to_srgb(arr[..., :3]))
        return arr
    from PIL import Image

    img = Image.open(path)
    if wh is not None and img.size != wh:
        img = img.resize(wh, Image.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    return arr


def load_blender_split(root_dir: str, split: str, downsample: float = 1.0,
                       json_name: Optional[str] = None,
                       require_images: bool = True) -> BlenderScene:
    """Read transforms_{split}.json + PNGs (all three loaders' common core)."""
    name = json_name or f"transforms_{split}.json"
    with open(os.path.join(root_dir, name)) as f:
        meta = json.load(f)
    frames = meta["frames"]
    if "camera_angle_x" not in meta and "fl_x" not in meta \
            and "camera_angle_y" not in meta and "fl_y" not in meta:
        raise RuntimeError("Couldn't read fov.")  # dataset.py:204
    cax = float(meta.get("camera_angle_x", 0.0))
    images, alphas, c2ws, paths = [], [], [], []
    H = W = None
    img_paths = []
    for fr in frames:
        mat = np.asarray(fr["transform_matrix"], np.float32)
        if mat.shape[0] == 3:
            mat = np.concatenate([mat, [[0, 0, 0, 1.0]]], 0)
        fp = fr["file_path"]
        has_ext = fp.endswith((".png", ".bin", ".jpg", ".jpeg"))
        img_path = os.path.join(root_dir, fp if has_ext else fp + ".png")
        if os.path.exists(img_path):
            img_paths.append(img_path)
        elif require_images:
            raise FileNotFoundError(img_path)
        else:
            img_paths.append(None)
        c2ws.append(mat)
        paths.append(fp)

    # threaded preloading (barf data/base.py:66-87): PIL/zlib decode
    # releases the GIL, so a thread pool parallelizes real-dataset loads
    def load_one(p):
        if p is None:
            return None
        arr = _load_image(p)
        if downsample != 1.0:
            wh = (int(arr.shape[1] / downsample), int(arr.shape[0] / downsample))
            arr = _load_image(p, wh)
        return arr

    if sum(p is not None for p in img_paths) > 4:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            loaded = list(ex.map(load_one, img_paths))
    else:
        loaded = [load_one(p) for p in img_paths]
    for arr in loaded:
        if arr is None:
            continue
        if H is None:
            H, W = arr.shape[:2]
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, -1)
        if arr.shape[-1] == 4:
            alphas.append(arr[..., 3:4])
            images.append(arr[..., :3])
        else:
            alphas.append(np.ones_like(arr[..., :1]))
            images.append(arr[..., :3])
    if H is None:
        # test splits may carry no images (tensorf blender.py:108-113);
        # jnerf configs pass H/W explicitly, instant-ngp JSONs may carry w/h
        H = int(meta.get("h", 800))
        W = int(meta.get("w", 800))
        images = [np.zeros((H, W, 3), np.float32)] * 0
    # explicit fl_x/fl_y win over camera_angle (read_focal_length,
    # dataset.py:187-205)
    fl_x = meta.get("fl_x")
    fl_y = meta.get("fl_y")
    if fl_x is None and "camera_angle_x" in meta:
        fl_x = 0.5 * W / np.tan(0.5 * cax)
    if fl_y is None and "camera_angle_y" in meta:
        fl_y = 0.5 * H / np.tan(0.5 * float(meta["camera_angle_y"]))
    focal = fl_x if fl_x is not None else fl_y
    intrinsics = {
        "k1": float(meta.get("k1", 0.0)), "k2": float(meta.get("k2", 0.0)),
        "p1": float(meta.get("p1", 0.0)), "p2": float(meta.get("p2", 0.0)),
        "cx": float(meta.get("cx", W / 2.0)),
        "cy": float(meta.get("cy", H / 2.0)),
        "fl_x": float(fl_x if fl_x is not None else focal),
        "fl_y": float(fl_y if fl_y is not None else focal),
    }
    return BlenderScene(
        images=np.stack(images) if images else np.zeros((0, H, W, 3), np.float32),
        alphas=np.stack(alphas) if alphas else None,
        c2w=np.stack(c2ws), H=H, W=W, focal=float(focal), camera_angle_x=cax,
        file_paths=paths, intrinsics=intrinsics)


def blend_background(scene: BlenderScene, bg: float = 1.0) -> np.ndarray:
    """RGBA -> RGB over a constant background (data/blender.py:70-77)."""
    if scene.alphas is None:
        return scene.images
    return scene.images * scene.alphas + bg * (1.0 - scene.alphas)


# ---------------------------------------------------------------------------
# per-stack adapters
# ---------------------------------------------------------------------------

def barf_views(scene: BlenderScene, bg: float = 1.0):
    """-> (images [N,H,W,3], poses w2c [N,3,4], intr [N,3,3]) in BARF's
    convention (data/blender.py:80-92)."""
    images = blend_background(scene, bg)
    poses = conventions.parse_raw_camera_barf(jnp.asarray(scene.c2w))
    intr = jnp.broadcast_to(jnp.asarray(
        [[scene.focal, 0, scene.W / 2.0], [0, scene.focal, scene.H / 2.0],
         [0, 0, 1.0]], dtype=jnp.float32), (scene.c2w.shape[0], 3, 3))
    return jnp.asarray(images), poses, intr


def tensorf_ray_store(scene: BlenderScene, bg: float = 1.0):
    """-> (all_rays [N*H*W, 6], all_rgbs [N*H*W, 3]) with blender2opencv
    poses and normalised dirs (dataLoader/blender.py:63-129).

    Uses the native multithreaded builder (csrc/ray_store.cpp) when
    available — this whole-dataset precompute is the loader's hot host-side
    path — with the jnp implementation as fallback/golden reference.
    """
    images = blend_background(scene, bg)
    c2w_cv = np.asarray(conventions.blender2opencv(jnp.asarray(scene.c2w)))
    from ..ops.native import build_ray_store_native

    native = build_ray_store_native(c2w_cv[:, :3], scene.H, scene.W,
                                    scene.focal, scene.focal)
    if native is not None:
        rays = jnp.asarray(native)
    else:
        dirs = rays_lib.get_ray_directions(scene.H, scene.W, scene.focal)
        all_o, all_d = [], []
        for i in range(c2w_cv.shape[0]):
            o, d = rays_lib.get_rays_from_directions(dirs,
                                                     jnp.asarray(c2w_cv[i, :3]))
            all_o.append(o)
            all_d.append(d)
        rays = jnp.concatenate([jnp.concatenate(all_o),
                                jnp.concatenate(all_d)], -1)
    rgbs = jnp.asarray(images).reshape(-1, 3)
    return rays, rgbs


@dataclasses.dataclass
class NGPDataset:
    """jnerf-style dataset: NGP-space poses + infinite shuffled ray batches.

    Ref: NerfDataset (dataset.py). ``correct_pose`` sign flips, t*scale+offset
    with NERF_SCALE/0.5 defaults, per-image focal metadata.
    """

    images: np.ndarray      # [N, H, W, 3]
    alphas: Optional[np.ndarray]
    c2w_ngp: np.ndarray     # [N, 3, 4] NGP-space camera-to-world
    focal: np.ndarray       # [N, 2]
    H: int
    W: int
    aabb_scale: int = 1
    # 11-float per-image metadata record (dataset.py:180-211):
    # [k1, k2, p1, p2, cx/W, cy/H, fx, fy, light_dir(3)]
    metadata: Optional[np.ndarray] = None
    resolutions: Optional[np.ndarray] = None  # [N, 2] (W, H) per image

    @classmethod
    def from_scene(cls, scene: BlenderScene, aabb_scale: int = 1,
                   scale: Optional[float] = None, offset=None,
                   correct_pose=(-1, -1, 1)) -> "NGPDataset":
        scale = NERF_SCALE if scale is None else scale
        offset = np.asarray([0.5, 0.5, 0.5] if offset is None else offset,
                            np.float32)
        mats = np.stack([
            np.asarray(conventions.matrix_nerf2ngp(
                jnp.asarray(m[:3]), scale, jnp.asarray(offset),
                correct_pose=correct_pose))
            for m in scene.c2w])
        n = mats.shape[0]
        intr = scene.intrinsics or {}
        fx = intr.get("fl_x", scene.focal)
        fy = intr.get("fl_y", scene.focal)
        focal = np.broadcast_to(np.asarray([fx, fy], np.float32), (n, 2))
        md = np.zeros(11, np.float32)
        md[0] = intr.get("k1", 0.0)
        md[1] = intr.get("k2", 0.0)
        md[2] = intr.get("p1", 0.0)
        md[3] = intr.get("p2", 0.0)
        md[4] = intr.get("cx", scene.W / 2.0) / scene.W
        md[5] = intr.get("cy", scene.H / 2.0) / scene.H
        md[6], md[7] = fx, fy
        # light_dir (metadata[8:], dataset.py:209-210) stays zero
        metadata = np.repeat(md[None], n, axis=0)
        resolutions = np.repeat(np.asarray([[scene.W, scene.H]], np.float32),
                                n, axis=0)
        return cls(images=scene.images, alphas=scene.alphas, c2w_ngp=mats,
                   focal=np.array(focal), H=scene.H, W=scene.W,
                   aabb_scale=aabb_scale, metadata=metadata,
                   resolutions=resolutions)

    def rays_for_pixels(self, img_ids: np.ndarray, pix_ids: np.ndarray):
        """On-the-fly rays for (image, pixel) index pairs
        (generate_random_data, dataset.py:230-246): principal point and
        per-image focal from the metadata record, OpenCV-style lens
        undistortion when k1/k2/p1/p2 are nonzero (the reference passes the
        metadata into the CUDA ray generator)."""
        x = (pix_ids % self.W + 0.5).astype(np.float32)
        y = (pix_ids // self.W + 0.5).astype(np.float32)
        if self.metadata is not None:
            md = self.metadata[img_ids]
            fx, fy = md[:, 6], md[:, 7]
            cx, cy = md[:, 4] * self.W, md[:, 5] * self.H
            u = (x - cx) / fx
            v = (y - cy) / fy
            if np.abs(md[:, 0:4]).max() > 0:
                u, v = _undistort_opencv(u, v, md[:, 0], md[:, 1],
                                         md[:, 2], md[:, 3])
            dirs = np.stack([u, v, np.ones_like(u)], -1)
        else:
            f = self.focal[img_ids]
            dirs = np.stack([(x - self.W / 2.0) / f[:, 0],
                             (y - self.H / 2.0) / f[:, 1],
                             np.ones_like(x)], -1)
        m = self.c2w_ngp[img_ids]
        d = np.einsum("nij,nj->ni", m[:, :, :3], dirs)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = m[:, :, 3]
        return o.astype(np.float32), d.astype(np.float32)

    def pixel_values(self, img_ids, pix_ids, bg: Optional[np.ndarray] = None):
        """Target RGB with per-ray background compositing of RGBA
        (runner.py:66-68)."""
        flat = self.images.reshape(self.images.shape[0], -1, 3)
        rgb = flat[img_ids, pix_ids]
        if self.alphas is not None and bg is not None:
            a = self.alphas.reshape(self.alphas.shape[0], -1, 1)[img_ids, pix_ids]
            rgb = rgb * a + bg * (1.0 - a)
        return rgb.astype(np.float32)


def _undistort_opencv(u, v, k1, k2, p1, p2, iters: int = 3):
    """Iterative OpenCV lens undistortion (the reference's CUDA
    iterative_camera_undistortion applied to normalized image coords)."""
    u0, v0 = u, v
    for _ in range(iters):
        r2 = u * u + v * v
        rad = 1.0 + k1 * r2 + k2 * r2 * r2
        du = 2 * p1 * u * v + p2 * (r2 + 2 * u * u)
        dv = p1 * (r2 + 2 * v * v) + 2 * p2 * u * v
        u = (u0 - du) / rad
        v = (v0 - dv) / rad
    return u, v


class RayBatcher:
    """Infinite shuffled (img, pixel) batches (dataset.py:116-125)."""

    def __init__(self, n_images: int, n_pixels: int, batch: int, seed: int = 0):
        self.total = n_images * n_pixels
        self.n_pixels = n_pixels
        self.batch = batch
        self.rng = np.random.default_rng(seed)
        self._perm = self.rng.permutation(self.total)
        self._ptr = 0

    def next(self) -> Tuple[np.ndarray, np.ndarray]:
        if self._ptr + self.batch > self.total:
            self._perm = self.rng.permutation(self.total)
            self._ptr = 0
        ids = self._perm[self._ptr:self._ptr + self.batch]
        self._ptr += self.batch
        return (ids // self.n_pixels).astype(np.int32), \
            (ids % self.n_pixels).astype(np.int32)


def load_ngp_train_data(root_dir: str, aabb_scale: int = 1,
                        scale: Optional[float] = None, offset=None,
                        correct_pose=(-1, -1, 1)) -> NGPDataset:
    """jnerf train mode merges train+val JSONs (dataset.py:127-147)."""
    scenes = []
    for split in ("train", "val"):
        path = os.path.join(root_dir, f"transforms_{split}.json")
        if os.path.exists(path):
            scenes.append(load_blender_split(root_dir, split))
    assert scenes, f"no transforms_*.json under {root_dir}"
    base = scenes[0]
    if len(scenes) > 1 and scenes[1].images.shape[0]:
        base = BlenderScene(
            images=np.concatenate([s.images for s in scenes]),
            alphas=(np.concatenate([s.alphas for s in scenes])
                    if all(s.alphas is not None for s in scenes) else None),
            c2w=np.concatenate([s.c2w for s in scenes]),
            H=base.H, W=base.W, focal=base.focal,
            camera_angle_x=base.camera_angle_x,
            file_paths=base.file_paths + scenes[1].file_paths)
    return NGPDataset.from_scene(base, aabb_scale=aabb_scale, scale=scale,
                                 offset=offset, correct_pose=correct_pose)
