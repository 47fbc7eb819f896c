"""jefferson_tpu.diff"""
