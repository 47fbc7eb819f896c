"""jefferson_tpu.parallel"""
