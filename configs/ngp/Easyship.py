# Easyship with GARF-refined poses (parity: projects/ngp/configs/Easyship.py).
_base_ = "ngp_base.py"

exp_name = "Easyship"
dataset_dir = "data_refine/Easyship"  # refined poses from the GARF pipeline
dataset = dict(
    train=dict(type="NerfDataset", root_dir=dataset_dir,
               correct_pose=[-1, -1, 1], batch_size=4096, mode="train",
               aabb_scale=8, scale=None, offset=None),
    val=dict(type="NerfDataset", root_dir=dataset_dir,
             correct_pose=[-1, -1, 1], batch_size=4096, mode="val",
             aabb_scale=8, scale=None, offset=None),
    test=dict(type="NerfDataset", root_dir=dataset_dir,
              correct_pose=[-1, -1, 1], batch_size=4096, mode="test",
              have_img=False, H=800, W=800, aabb_scale=8, scale=None,
              offset=None),
)
fp16 = False
load_ckpt = True
