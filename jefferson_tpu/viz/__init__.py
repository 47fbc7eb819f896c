"""jefferson_tpu.viz"""
