"""jefferson_tpu.utils"""
