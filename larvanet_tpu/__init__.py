"""larvanet_tpu — TPU-native super-resolution framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of the
Geunwoo-Jeon/LarvaNet AIM2020 efficient-SR workbench (see SURVEY.md):
a pluggable model zoo (EDSR, the multi-exit LarvaNet family, MSRR
ablations, EBRN, IMDN, MAMNet, REGO, TreeNet, HRSR, DWSR), DIV2K
patch-sampling dataloaders with crop/rot90/flip augmentation, step- and
volume-driven training with PSNR-plateau LR scheduling, chop-forward
tiled full-frame inference, Y-channel PSNR/SSIM evaluation, and
flag-compatible CLIs.

Design stance (TPU-first, not a port):
  * NHWC layout everywhere on device; the host-facing API keeps the
    reference's CHW float32 [0,255] contract and converts at the edge.
  * Everything hot is jit-compiled with static shapes: the augmentation
    pipeline, the train step (multi-exit losses fused into one graph),
    and batched tiled inference.
  * Scaling via `jax.sharding.Mesh` + NamedSharding/shard_map (data
    parallel training, spatially-sharded halo inference), not threads.
  * Pallas kernels for the hot fused conv paths, behind a flag with an
    XLA fallback.
"""

__version__ = "0.1.0"
