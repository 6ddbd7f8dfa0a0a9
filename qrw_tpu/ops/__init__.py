"""Low-level compute kernels: rotations, rigid-body dynamics, QP solvers."""
