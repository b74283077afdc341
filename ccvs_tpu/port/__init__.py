"""Checkpoint porting: reference PyTorch `.pth` files -> ccvs_tpu pytrees."""
