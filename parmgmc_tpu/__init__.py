"""parmgmc_tpu — TPU-native Multigrid Monte Carlo sampling of Gaussians.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ParMGMC
(https://github.com/nilsfriess/ParMGMC): samplers for high-dimensional
Gaussian distributions N(A^{-1} f, A^{-1}) with sparse SPD precision
operators, including Gibbs/SOR samplers, exact Cholesky samplers,
Multigrid Monte Carlo, and low-rank-updated posteriors for Bayesian
linear inverse problems — designed for TPU device meshes via
``shard_map``/``pjit`` rather than MPI domain decomposition.
"""

__version__ = "0.1.0"
