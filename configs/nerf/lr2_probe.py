# Short probe: does the reference's lr 1e-2 (nerf_base.py:22) train the
# OriginNeRF field once the GradScaler step-skip semantics are in place
# (fp16=True -> skip_nonfinite)? Round-4d found plain Adam saturates at
# ~6 dB; this isolates whether skipped-overflow-steps were the missing
# reference mechanism or whether 1e-2 is simply unstable for this field
# under bf16.
_base_ = "budget_synthetic.py"

exp_name = "nerf_lr2_probe"
tot_train_steps = 2000
optim = dict(type="Adam", lr=1e-2, eps=1e-15, betas=(0.9, 0.99))
load_ckpt = False
