"""TPU-native distributed K-FAC preconditioning framework."""
