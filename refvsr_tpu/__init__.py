"""refvsr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) reference-based video
super-resolution framework with the capabilities of codeslake/RefVSR
(CVPR 2022), redesigned TPU-first. See SURVEY.md for the reference map."""

__version__ = "0.1.0"
