"""open-genie-tpu: TPU-native generative interactive world model framework.

A from-scratch JAX/XLA/Pallas implementation of the Genie architecture
(tokenizer + latent actions + MaskGIT dynamics) with the full capability
surface of myscience/open-genie, re-designed TPU-first: channels-last
layouts, compiled rollout loops, factorized entropy kernels, and
mesh-sharded training.
"""
__version__ = "0.1.0"
