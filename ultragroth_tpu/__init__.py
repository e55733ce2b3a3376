"""ultragroth_tpu — TPU-native Groth16 / UltraGroth zkSNARK proving framework.

A from-scratch JAX/Pallas rebuild of the capabilities of rarimo/ultragroth
(rapidsnark fork): BN254 Groth16 + 2-round UltraGroth provers and verifiers,
zkey/wtns/uwtns formats, C-API-compatible Python API, CLIs, and a proof
server — with the hot path (MSM, NTT, field kernels) running on TPU via
vectorized multi-limb Montgomery arithmetic.
"""

__version__ = "0.1.0"
