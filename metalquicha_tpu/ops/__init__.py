"""Custom TPU kernels (Pallas) for hot paths the XLA defaults handle poorly.

Currently: batched small-matrix symmetric eigensolver (cyclic Jacobi) for
the SCC loop — XLA's eigh on TPU is latency-bound for the many tiny Fock
matrices an MBE fragment batch produces.
"""
