"""TPU compute path: limb-plane field kernels, NTT, curve ops, MSM."""
