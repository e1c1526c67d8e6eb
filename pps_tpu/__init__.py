"""pps-tpu: a TPU-native person re-identification framework.

Brand-new implementation of the capabilities of shenyunhang/PPS (IJCAI 2019
"A Part Power Set Model for Scale-Free Person Retrieval") on
jax/XLA/Pallas/pjit.  See SURVEY.md at the repo root for the structural
analysis of the reference that drives this design.
"""

__version__ = '0.1.0'
