"""jefferson_tpu.pallas"""
