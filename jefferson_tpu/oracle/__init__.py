"""jefferson_tpu.oracle"""
