# Tiny synthetic OriginNeRF demo (no external data) — CLI smoke drives.
_base_ = "nerf_base.py"

exp_name = "nerf_demo"
synthetic = True
synthetic_size = 24
synthetic_views = 10
tot_train_steps = 64
n_rays_per_batch = 512
target_batch_size = 1 << 13
n_grid_uniform = 1 << 12
n_grid_nonuniform = 1 << 12
n_coarse = 64
n_samples = 16
n_compact = 16
near_distance = 0.05
fp16 = False
expdecay = dict(type="ExpDecay", decay_start=10**6, decay_interval=10_000,
                decay_base=0.33, decay_end=None)
dataset = dict(train=dict(aabb_scale=1))
