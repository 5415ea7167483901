"""medgp_tpu: a TPU-native framework for sparse multi-output Gaussian processes.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the MedGP
reference framework (bee-hive/MedGP): per-patient SM-LMC (spectral-mixture,
linearly-coregionalized) Gaussian processes over irregularly-sampled clinical
time series, MAP hyperparameter inference with a sparsity-inducing
hierarchical-gamma prior (variational EM + scaled conjugate gradients), an HMC
posterior-sampling path, population kernel clustering (GMM+BIC, KDE mode
kernels), online one-step-ahead imputation testing, and cohort evaluation.

Design stance (not a port):
  * All compute-path math is pure, batched JAX: autodiff replaces the
    reference's ~1100 hand-coded per-hyperparameter gradient matrices
    (reference: medgpc/src/kernel/c_kernel_LMC_SM.cpp:198-327), `vmap`
    replaces the serial random-restart loop and the Slurm per-patient fan-out
    (reference: medgpc/src/main_one_train.cpp:228-253,
    medgpc/util/run_exp_generator.py:213-263), and a `jax.sharding.Mesh` plus
    in-program collectives replace the shared-filesystem dataflow.
  * Ragged patients are handled with padding + masks so batched Cholesky and
    NLML stay fixed-shape and MXU-friendly.
  * File-format compatibility with the reference artifacts (feature{i}.txt,
    feature{i}_stat.bin, train_hyp_*.bin, mode_param.bin, ...) is preserved in
    :mod:`medgp_tpu.data.formats` so results can be compared 1:1.
"""

__version__ = "0.1.0"

from medgp_tpu.models.params import LMCSMSpec, SESpec, SMSpec  # noqa: F401
