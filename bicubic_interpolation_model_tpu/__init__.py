"""bicubic_interpolation_model_tpu — a TPU-native (JAX/XLA/Pallas) image-resampling
and super-resolution framework.

Re-designed from scratch for TPU hardware with the capabilities of the
bloom-lmh/Bicubic-Interpolation-Model reference (Node.js). The compute path is
JAX/Pallas (MXU matmul resampling, phase-decomposed FMA kernels); the runtime
around it (codecs, tensor-file IO) has a native C++ fast path.

Subpackages
-----------
core        kernel math (Keys cubic, Lanczos), axis resampling plans, NumPy oracle
ops         jnp + Pallas resize ops, apply-weights, adaptive bicubic, downsample
models      weight-predictor (flax), ESPCN/ESRGAN-class baselines, TFJS import
data        DIV2K pipeline, .bin tensor format (12-byte header) + metadata.json
train       jit train step, optimizer, checkpointing
evaluation  PSNR/SSIM/MSE, diff images, CSV reports
bench       performance harness (warmup/timed runs, CSV + JSON)
parallel    device mesh, shard_map batch/spatial parallelism, halo exchange
cli         subcommands replacing the reference's npm scripts
utils       config, logging, image IO
runtime     ctypes bindings to the native C++ IO library
"""

__version__ = "0.1.0"
