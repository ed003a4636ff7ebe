"""sdpb_tpu — a TPU-native semidefinite-program solver for polynomial
matrix programs, with the capabilities of SDPB (vasdommes/sdpb).

Compute path: JAX/XLA with multi-limb float32 expansions (TPU) or float64
expansions (CPU) replacing GMP arbitrary precision; block-batched arrays
replacing Elemental DistMatrix; psum/reduce_scatter over a jax device mesh
replacing MPI.
"""
__version__ = "0.1.0"
