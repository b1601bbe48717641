# Car scene (parity: projects/ngp/configs/Car.py).
_base_ = "ngp_base.py"

exp_name = "Car"
dataset_dir = "data/Car"
dataset = dict(
    train=dict(type="NerfDataset", root_dir=dataset_dir,
               correct_pose=[-1, -1, 1], batch_size=4096, mode="train",
               aabb_scale=4, scale=None, offset=[-2.0, -0.5, 0.0]),
    val=dict(type="NerfDataset", root_dir=dataset_dir,
             correct_pose=[-1, -1, 1], batch_size=4096, mode="val",
             aabb_scale=4, scale=None, offset=[-2.0, -0.5, 0.0]),
    test=dict(type="NerfDataset", root_dir=dataset_dir,
              correct_pose=[-1, -1, 1], batch_size=4096, mode="test",
              have_img=False, H=800, W=800, aabb_scale=4, scale=None,
              offset=[-2.0, -0.5, 0.0]),
)
fp16 = True
