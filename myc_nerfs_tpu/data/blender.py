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


def _load_image(path: str, wh: Optional[Tuple[int, int]] = None):
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
    cax = float(meta["camera_angle_x"])
    images, alphas, c2ws, paths = [], [], [], []
    H = W = None
    for fr in frames:
        mat = np.asarray(fr["transform_matrix"], np.float32)
        if mat.shape[0] == 3:
            mat = np.concatenate([mat, [[0, 0, 0, 1.0]]], 0)
        fp = fr["file_path"]
        img_path = os.path.join(root_dir, fp if fp.endswith(".png") else fp + ".png")
        if os.path.exists(img_path):
            arr = _load_image(img_path)
            if downsample != 1.0:
                wh = (int(arr.shape[1] / downsample), int(arr.shape[0] / downsample))
                arr = _load_image(img_path, wh)
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
        elif require_images:
            raise FileNotFoundError(img_path)
        c2ws.append(mat)
        paths.append(fp)
    if H is None:
        # test splits may carry no images (tensorf blender.py:108-113)
        H = W = 800
        images = [np.zeros((H, W, 3), np.float32)] * 0
    focal = 0.5 * W / np.tan(0.5 * cax)
    return BlenderScene(
        images=np.stack(images) if images else np.zeros((0, H, W, 3), np.float32),
        alphas=np.stack(alphas) if alphas else None,
        c2w=np.stack(c2ws), H=H, W=W, focal=float(focal), camera_angle_x=cax,
        file_paths=paths)


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
    poses and normalised dirs (dataLoader/blender.py:63-129)."""
    images = blend_background(scene, bg)
    c2w_cv = np.asarray(conventions.blender2opencv(jnp.asarray(scene.c2w)))
    dirs = rays_lib.get_ray_directions(scene.H, scene.W, scene.focal)
    all_o, all_d = [], []
    for i in range(c2w_cv.shape[0]):
        o, d = rays_lib.get_rays_from_directions(dirs, jnp.asarray(c2w_cv[i, :3]))
        all_o.append(o)
        all_d.append(d)
    rays = jnp.concatenate([jnp.concatenate(all_o), jnp.concatenate(all_d)], -1)
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
        focal = np.broadcast_to(np.asarray([scene.focal, scene.focal],
                                           np.float32), (mats.shape[0], 2))
        return cls(images=scene.images, alphas=scene.alphas, c2w_ngp=mats,
                   focal=np.array(focal), H=scene.H, W=scene.W,
                   aabb_scale=aabb_scale)

    def rays_for_pixels(self, img_ids: np.ndarray, pix_ids: np.ndarray):
        """On-the-fly rays for (image, pixel) index pairs
        (generate_random_data, dataset.py:230-246)."""
        x = (pix_ids % self.W + 0.5).astype(np.float32)
        y = (pix_ids // self.W + 0.5).astype(np.float32)
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
