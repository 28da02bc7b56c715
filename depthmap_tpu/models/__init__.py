"""Model zoo: TPU-native (flax.linen, NHWC) re-implementations of the
reference's 15 depth networks plus the auxiliary nets (pix2pix merge,
inpainting).  Weights are converted from the reference torch checkpoints by
models/convert.py; architectures are re-derived, not translated."""
