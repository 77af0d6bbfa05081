"""StudioGAN-TPU: a TPU-native JAX/Flax re-design of PyTorch-StudioGAN.

Same capability surface as POSTECH-CVLab/PyTorch-StudioGAN (reference:
/root/reference/src) rebuilt TPU-first:

- one SPMD train step under ``jax.jit`` over a ``jax.sharding.Mesh``
  (replaces the reference's DP / DDP / multi-node-DDP triplet,
  reference: src/models/model.py:157-200, src/main.py:175-196);
- cross-replica BatchNorm for free under GSPMD (replaces
  src/sync_batchnorm/ and torch SyncBatchNorm);
- functional state: everything the reference keeps as mutable module
  state (spectral-norm u vectors, BN running stats, EMA weights, ADA p,
  LeCam EMAs, top-k) is an explicit pytree carried through the step;
- Pallas TPU kernels for the reference's CUDA ops
  (src/utils/style_ops/{bias_act,upfirdn2d,filtered_lrelu}.cu).
"""

__version__ = "0.1.0"
