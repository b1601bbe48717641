"""Visualization: depth colormaps, image tiling, camera-pose plots, videos.

Re-implements the reference's visualization surface (SURVEY.md B10/T10,
§5.5):
- depth colormap (tensorf-myc/utils.py:11-54, cv2 JET)
- TB-style image tiling (barf-myc/util_vis.py:15-27)
- camera-frustum wireframe plots + pose-evolution video
  (barf-myc/util_vis.py:178-250) via matplotlib
- video writing via imageio/cv2 (runner.py:105-125, renderer.py:134-135);
  ffmpeg is absent in this environment so mp4 writing is gated
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def visualize_depth(depth: np.ndarray, minmax: Optional[Tuple[float, float]] = None):
    """Depth [H, W] -> JET colormap [H, W, 3] float in [0, 1] + (mi, ma).

    Ref: utils.py:11-54.
    """
    import cv2

    x = np.nan_to_num(np.asarray(depth))
    if minmax is None:
        pos = x[x > 0]
        mi = float(pos.min()) if pos.size else 0.0
        ma = float(x.max())
    else:
        mi, ma = minmax
    xn = ((x - mi) / (ma - mi + 1e-8) * 255).astype(np.uint8)
    colored = cv2.applyColorMap(xn, cv2.COLORMAP_JET)[..., ::-1]  # BGR->RGB
    return colored.astype(np.float32) / 255.0, (mi, ma)


def tile_images(images: Sequence[np.ndarray], cols: int = 4) -> np.ndarray:
    """Tile [N, H, W, 3] into one image (tb_image, util_vis.py:15-27)."""
    images = np.asarray(images)
    n, H, W, C = images.shape
    rows = (n + cols - 1) // cols
    canvas = np.zeros((rows * H, cols * W, C), images.dtype)
    for i in range(n):
        r, c = divmod(i, cols)
        canvas[r * H:(r + 1) * H, c * W:(c + 1) * W] = images[i]
    return canvas


def _frustum_points(pose_w2c: np.ndarray, depth: float = 0.5) -> np.ndarray:
    """Camera wireframe vertices in world frame (util_vis.py camera glyph)."""
    R, t = pose_w2c[:3, :3], pose_w2c[:3, 3]
    center = -R.T @ t
    corners_cam = np.asarray([[-0.5, -0.5, 1], [0.5, -0.5, 1],
                              [0.5, 0.5, 1], [-0.5, 0.5, 1]]) * depth
    corners = corners_cam @ R + center  # R.T.T
    return np.concatenate([center[None], corners], 0)


def plot_poses(poses: np.ndarray, poses_ref: Optional[np.ndarray] = None,
               path: str = "poses.png", cam_depth: float = 0.5) -> str:
    """Camera-frustum wireframe plot (plot_save_poses_blender,
    util_vis.py:178-250). poses are world->cam [N, 3, 4]."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")

    def draw(pose_set, color):
        for p in pose_set:
            pts = _frustum_points(np.asarray(p), cam_depth)
            c, quad = pts[0], pts[1:]
            for q in quad:
                ax.plot(*zip(c, q), color=color, linewidth=0.5)
            loop = np.concatenate([quad, quad[:1]], 0)
            ax.plot(loop[:, 0], loop[:, 1], loop[:, 2], color=color,
                    linewidth=0.5)

    if poses_ref is not None:
        draw(poses_ref, "tab:blue")
    draw(poses, "tab:red")
    ax.set_box_aspect((1, 1, 1))
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path


def save_pose_evolution_video(pose_history: List[np.ndarray],
                              poses_ref: np.ndarray, out_dir: str,
                              fps: int = 10) -> Optional[str]:
    """Pose-evolution frames + video (generate_videos_pose,
    barf.py:264-297). Returns the video path or None if no encoder."""
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i, poses in enumerate(pose_history):
        p = os.path.join(out_dir, f"{i:04d}.png")
        plot_poses(np.asarray(poses), poses_ref, p)
        frames.append(p)
    return write_video(os.path.join(out_dir, "poses.mp4"),
                       [np.asarray(_imread(f)) for f in frames], fps=fps)


def _imread(path):
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def write_video(path: str, frames: Sequence[np.ndarray], fps: int = 30
                ) -> Optional[str]:
    """Write an mp4 via cv2 (runner.py:105-125) or imageio; returns None when
    no encoder is available (ffmpeg absent), after dumping PNG frames."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        return None
    u8 = [f if f.dtype == np.uint8 else
          (np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
    try:
        import cv2

        H, W = u8[0].shape[:2]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
        if vw.isOpened():
            for f in u8:
                vw.write(f[..., ::-1])
            vw.release()
            if os.path.exists(path) and os.path.getsize(path) > 0:
                return path
    except Exception:
        pass
    # fallback: PNG frame dump next to the intended video
    base = os.path.splitext(path)[0]
    os.makedirs(base, exist_ok=True)
    from PIL import Image

    for i, f in enumerate(u8):
        Image.fromarray(f).save(os.path.join(base, f"{i:04d}.png"))
    return None
