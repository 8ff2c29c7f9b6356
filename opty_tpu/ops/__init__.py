"""Low-level TPU kernels (Pallas) and specialized linear algebra.

Currently the structured KKT solve uses XLA-compiled ``lax.scan``
block recursions (nlp/kkt.py); batched Pallas cyclic-reduction kernels
for the node axis land here as the performance work deepens.
"""
