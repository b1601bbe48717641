# Tiny synthetic NGP demo (no external data) — CLI smoke drives.
_base_ = "ngp_base.py"

exp_name = "demo"
synthetic = True
synthetic_size = 24
synthetic_views = 10
tot_train_steps = 300
n_rays_per_batch = 1024
target_batch_size = 1 << 14
n_grid_uniform = 1 << 14
n_grid_nonuniform = 1 << 14
n_coarse = 128
n_samples = 32
near_distance = 0.05
optim = dict(type="Adam", lr=2e-2, eps=1e-15, betas=(0.9, 0.99))
expdecay = dict(type="ExpDecay", decay_start=10**6, decay_interval=10_000,
                decay_base=0.33, decay_end=None)
hash_grid_overrides = dict(n_levels=8, log2_hashmap_size=15,
                           desired_resolution=256.0)
dataset = dict(train=dict(aabb_scale=1))
