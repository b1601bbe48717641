"""myc_nerfs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) NeRF framework.

Re-implements, TPU-first, the capabilities of the Jittor competition stack
FREDZEL2020/jittor-MYC-NeRFs (see SURVEY.md):

- ``models.nerf_mlp``   — vanilla NeRF MLP + BARF coarse-to-fine PE + GARF gaussian acts
- ``models.tensorf``    — TensoRF VM/CP factor grids (+ NeRF++ background, Ref-NeRF shading)
- ``models.ngp``        — Instant-NGP hash-grid + fused MLPs + occupancy-grid marching
- ``geom``              — Lie/SE(3) camera math, Procrustes, ray generation, conventions
- ``render``            — stratified/PDF sampling, masked ray marching, compositing scans
- ``ops``               — XLA + Pallas kernels (hash encode, fused MLP, grid_sample, SH)
- ``parallel``          — device mesh / sharding layer (DP over rays, optional grid TP)
- ``train`` / ``eval``  — jitted train steps, metrics, pose export
"""

__version__ = "0.1.0"
