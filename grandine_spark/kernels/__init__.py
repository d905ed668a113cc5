"""Pure numpy/python geometry + tile kernels. Spark-free.

These are exact-semantics re-implementations (not translations of code
structure) of the reference's geometry routines, written so that batch
(vectorized numpy) and scalar (golden-test) paths produce identical values.
"""
