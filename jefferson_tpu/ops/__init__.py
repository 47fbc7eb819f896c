"""jefferson_tpu.ops"""
